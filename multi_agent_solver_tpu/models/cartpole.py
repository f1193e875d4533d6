"""Cart-pole model (underactuated swing-up benchmark).

No reference counterpart (the reference's models stop at the 1-DOF pendulum,
``examples/models/pendulum_model.hpp``); included because cart-pole swing-up
is the canonical nonconvex trajectory-optimization benchmark one size up.

State ``(p, theta, p_dot, theta_dot)`` with ``theta = 0`` hanging DOWN and
``theta = pi`` upright; control ``(force,)`` on the cart.  Frictionless
dynamics (standard form, e.g. Tedrake, *Underactuated Robotics*, ch. 3):

    denom     = m_c + m_p sin^2(theta)
    p_ddot    = [ f + m_p sin(theta) (l theta_dot^2 + g cos(theta)) ] / denom
    theta_ddot= [ -f cos(theta) - m_p l theta_dot^2 cos(theta) sin(theta)
                  - (m_c + m_p) g sin(theta) ] / (l denom)

Constants: m_c = 1, m_p = 0.3, l = 0.5, g = 9.81.  Only smooth elementwise
ops (sin/cos and a strictly positive denominator), so the model is
lane-traceable and runs on the fused Pallas iLQR path (nx=4 like the
headline single-track model).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array

M_CART = 1.0
M_POLE = 0.3
L_POLE = 0.5
G = 9.81


def cartpole_dynamics(x: Array, u: Array) -> Array:
    p, theta, p_dot, theta_dot = x[0], x[1], x[2], x[3]
    f = u[0]
    s, c = jnp.sin(theta), jnp.cos(theta)
    denom = M_CART + M_POLE * s * s
    p_ddot = (f + M_POLE * s * (L_POLE * theta_dot * theta_dot + G * c)) / denom
    theta_ddot = (
        -f * c
        - M_POLE * L_POLE * theta_dot * theta_dot * c * s
        - (M_CART + M_POLE) * G * s
    ) / (L_POLE * denom)
    return jnp.stack([p_dot, theta_dot, p_ddot, theta_ddot])


def cartpole_swing_up_stage_cost(x: Array, u: Array, t) -> Array:
    """Upright shaping: ``1 + cos(theta)`` vanishes at theta = pi."""
    upright = 1.0 + jnp.cos(x[1])
    return (
        10.0 * upright * upright
        + 0.1 * x[0] * x[0]
        + 0.05 * x[2] * x[2]
        + 0.05 * x[3] * x[3]
        + 0.001 * u[0] * u[0]
    )


def cartpole_swing_up_terminal_cost(x: Array) -> Array:
    upright = 1.0 + jnp.cos(x[1])
    return (
        200.0 * upright * upright
        + 2.0 * x[0] * x[0]
        + 5.0 * x[2] * x[2]
        + 5.0 * x[3] * x[3]
    )
