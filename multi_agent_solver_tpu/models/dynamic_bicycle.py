"""Dynamic bicycle model with linear tires (beyond the reference's models).

The reference ships only the kinematic bicycle (single_track_model.hpp);
this 6-state dynamic variant adds lateral-slip tire forces -- the standard
vehicle-dynamics upgrade once speeds make the kinematic model lie -- and
exercises the nx <= 8 fused-kernel path (the reference-sized models stop at
nx = 4).

State ``(X, Y, psi, vx, vy, r)``, control ``(delta, ax)``:

    X_dot   = vx cos(psi) - vy sin(psi)
    Y_dot   = vx sin(psi) + vy cos(psi)
    psi_dot = r
    vx_dot  = ax + vy r
    vy_dot  = (Fyf cos(delta) + Fyr)/m - vx r
    r_dot   = (lf Fyf cos(delta) - lr Fyr)/Iz

with linear-tire lateral forces ``Fyf = Caf alpha_f``, ``Fyr = Car alpha_r``
and small-angle slip ``alpha_f = delta - (vy + lf r)/max(vx, V_EPS)`` (the
standard linear-tire form; the speed floor keeps the model finite through
standstill, the same guarding idea the reference applies to the rocket's
mass singularity, rocket_model.hpp ``max(m, 1e-6)``).  The ratio form --
rather than ``arctan`` of it -- is both the textbook linear-tire model and
what keeps the dynamics lowerable inside the fused Pallas kernels (Mosaic
has no ``atan`` primitive).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array

MASS = 1500.0       # kg
IZ = 2250.0         # kg m^2
LF = 1.2            # m, CoG -> front axle
LR = 1.3            # m, CoG -> rear axle
CAF = 8.0e4         # N/rad front cornering stiffness
CAR = 9.0e4         # N/rad rear cornering stiffness
V_EPS = 0.5         # m/s slip-angle speed floor


def dynamic_bicycle_model(x: Array, u: Array) -> Array:
    psi, vx, vy, r = x[2], x[3], x[4], x[5]
    delta, ax = u[0], u[1]
    vx_safe = jnp.maximum(vx, V_EPS)
    alpha_f = delta - (vy + LF * r) / vx_safe
    alpha_r = -(vy - LR * r) / vx_safe
    fyf = CAF * alpha_f
    fyr = CAR * alpha_r
    cos_d = jnp.cos(delta)
    return jnp.stack(
        [
            vx * jnp.cos(psi) - vy * jnp.sin(psi),
            vx * jnp.sin(psi) + vy * jnp.cos(psi),
            r,
            ax + vy * r,
            (fyf * cos_d + fyr) / MASS - vx * r,
            (LF * fyf * cos_d - LR * fyr) / IZ,
        ]
    )
