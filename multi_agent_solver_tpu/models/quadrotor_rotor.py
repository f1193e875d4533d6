"""Quadrotor with first-order rotor dynamics (nx=16, nu=4).

Extends the 12-state quadrotor (models/quadrotor.py) with the standard
actuator-lag refinement: each rotor's thrust is a first-order lag behind
its command, so the controls are commanded rotor thrusts and the produced
thrusts are four extra states.  This is the canonical nx=16 benchmark this
framework's docs were missing -- the Riccati backend auto gate hands
nx > 12 to the batched XLA-scan backward, and until this model existed the
pallas-vs-scan crossover at nx=16 was untested at fair lane occupancy
(docs/BENCHMARKS.md).

State ``(x, y, z, vx, vy, vz, phi, theta, psi, p, q, r, w0, w1, w2, w3)``
where ``w_i`` is rotor i's thrust (N).  Control ``(c0, c1, c2, c3)`` --
commanded rotor thrusts.

Plus-configuration mixing with arm length ``ARM`` and yaw-moment
coefficient ``K_YAW`` (rotors on +x, +y, -x, -y arms; adjacent rotors
counter-rotate):

    f     = w0 + w1 + w2 + w3
    tau_x = ARM * (w1 - w3)
    tau_y = ARM * (w2 - w0)
    tau_z = K_YAW * (w0 - w1 + w2 - w3)
    w_dot = (c - w) / TAU_ROTOR

The rigid-body part (thrust direction, guarded Euler-rate kinematics,
diagonal-inertia Euler equations) is shared with quadrotor.py, including
its ``|theta| < ~84 deg`` validity envelope.  The model has no reference
counterpart (the reference's largest model is the 4-state bicycle,
single_track_model.hpp); it exists to exercise and measure the large-state
solver route.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array
from .quadrotor import C_EPS, GRAVITY, JX, JY, JZ, MASS

ARM = 0.2           # m rotor arm length
K_YAW = 0.05        # yaw moment per unit thrust differential
TAU_ROTOR = 0.05    # s rotor first-order time constant

HOVER_ROTOR_THRUST = MASS * GRAVITY / 4.0


def quadrotor_rotor_dynamics(x: Array, u: Array) -> Array:
    vx, vy, vz = x[3], x[4], x[5]
    phi, theta, psi = x[6], x[7], x[8]
    p, q, r = x[9], x[10], x[11]
    w0, w1, w2, w3 = x[12], x[13], x[14], x[15]

    f = w0 + w1 + w2 + w3
    tx = ARM * (w1 - w3)
    ty = ARM * (w2 - w0)
    tz = K_YAW * (w0 - w1 + w2 - w3)

    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    spsi, cpsi = jnp.sin(psi), jnp.cos(psi)

    a = f / MASS
    ax = (cpsi * sth * cphi + spsi * sphi) * a
    ay = (spsi * sth * cphi - cpsi * sphi) * a
    az = (cth * cphi) * a - GRAVITY

    cth_safe = jnp.where(cth >= 0.0, jnp.maximum(cth, C_EPS),
                         jnp.minimum(cth, -C_EPS))
    tth = sth / cth_safe
    phi_dot = p + (q * sphi + r * cphi) * tth
    theta_dot = q * cphi - r * sphi
    psi_dot = (q * sphi + r * cphi) / cth_safe

    p_dot = (tx - (JZ - JY) * q * r) / JX
    q_dot = (ty - (JX - JZ) * p * r) / JY
    r_dot = (tz - (JY - JX) * p * q) / JZ

    inv_tau = 1.0 / TAU_ROTOR
    return jnp.stack(
        [vx, vy, vz, ax, ay, az,
         phi_dot, theta_dot, psi_dot, p_dot, q_dot, r_dot,
         (u[0] - w0) * inv_tau, (u[1] - w1) * inv_tau,
         (u[2] - w2) * inv_tau, (u[3] - w3) * inv_tau]
    )
