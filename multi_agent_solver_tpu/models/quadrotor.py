"""Quadrotor model (nx=12, nu=4 -- beyond the reference's model zoo).

The reference's largest model is the 4-state kinematic bicycle
(single_track_model.hpp); this 12-state quadrotor is the standard
aerial-robotics benchmark and exercises the framework's large-state route:
since round 3 the iLQR auto gate keeps nx <= 16 on the fused lane-resident
Pallas path (17.1k solves/s at batch 8192, 3.5x the XLA-scan route it used
before -- docs/BENCHMARKS.md); larger states hand off to the batched
XLA-scan backward.  See quadrotor_rotor.py for the nx=16 actuator-lag
variant.

State ``(x, y, z, vx, vy, vz, phi, theta, psi, p, q, r)`` -- world
position, world velocity, ZYX Euler angles, body rates.  Control
``(f, tau_x, tau_y, tau_z)`` -- total thrust along body z and body
torques.

    p_dot     = v
    v_dot     = [0, 0, -g] + R_wb(phi, theta, psi) @ [0, 0, f/m]
    eul_dot   = W(phi, theta) @ [p, q, r]          (ZYX Euler-rate map)
    omega_dot = J^{-1} (tau - omega x (J omega))   (diagonal inertia)

``W`` contains ``1/cos(theta)``; a cosine floor (``C_EPS``) keeps the
gimbal-lock singularity finite, the same guarding idea the reference
applies to the rocket's mass singularity (rocket_model.hpp
``max(m, 1e-6)``).  All terms are ``sin/cos`` + rational, so the model is
AD-exact under the default derivative path.

Valid attitude envelope: with ``C_EPS = 0.1`` the guarded tangent
saturates at ``10 * sin(theta)``, so the Euler-rate kinematics are exact
only for ``|theta| < ~84 deg``.  Hover, waypoint, and swarm problems stay
far inside this; aggressive maneuvers whose optimal trajectory pitches
near vertical would silently use the saturated (wrong) kinematics -- use a
quaternion model for those.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array

MASS = 1.0          # kg
GRAVITY = 9.81      # m/s^2
JX = 0.01           # kg m^2 body-x inertia
JY = 0.01           # kg m^2 body-y inertia
JZ = 0.02           # kg m^2 body-z inertia
C_EPS = 0.1         # cos(theta) floor guarding the Euler-rate singularity

HOVER_THRUST = MASS * GRAVITY


def quadrotor_dynamics(x: Array, u: Array) -> Array:
    vx, vy, vz = x[3], x[4], x[5]
    phi, theta, psi = x[6], x[7], x[8]
    p, q, r = x[9], x[10], x[11]
    f, tx, ty, tz = u[0], u[1], u[2], u[3]

    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    spsi, cpsi = jnp.sin(psi), jnp.cos(psi)

    # Third column of the ZYX body->world rotation (thrust direction).
    a = f / MASS
    ax = (cpsi * sth * cphi + spsi * sphi) * a
    ay = (spsi * sth * cphi - cpsi * sphi) * a
    az = (cth * cphi) * a - GRAVITY

    # ZYX Euler-rate kinematics with a guarded cos(theta).
    cth_safe = jnp.where(cth >= 0.0, jnp.maximum(cth, C_EPS),
                         jnp.minimum(cth, -C_EPS))
    tth = sth / cth_safe
    phi_dot = p + (q * sphi + r * cphi) * tth
    theta_dot = q * cphi - r * sphi
    psi_dot = (q * sphi + r * cphi) / cth_safe

    # Diagonal-inertia Euler equations.
    p_dot = (tx - (JZ - JY) * q * r) / JX
    q_dot = (ty - (JX - JZ) * p * r) / JY
    r_dot = (tz - (JY - JX) * p * q) / JZ

    return jnp.stack(
        [vx, vy, vz, ax, ay, az,
         phi_dot, theta_dot, psi_dot, p_dot, q_dot, r_dot]
    )
