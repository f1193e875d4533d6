"""Damped pendulum model (0 = upright).

Same physics and constants as the reference's ``examples/models/
pendulum_model.hpp:8-44``: state ``(theta, omega)``, control ``(torque,)``,

    omega_dot = (g/l) sin(theta) + u/(m l^2) - (b/(m l^2)) omega

with g = 9.81, l = m = 1, damping b = 0.1.  Pure JAX, batch-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array

G = 9.81
L = 1.0
M = 1.0
B = 0.1


def pendulum_dynamics(x: Array, u: Array) -> Array:
    theta, omega = x[0], x[1]
    omega_dot = (G / L) * jnp.sin(theta) + u[0] / (M * L * L) - (B / (M * L * L)) * omega
    return jnp.stack([omega, omega_dot])


def pendulum_state_jacobian(x: Array, u: Array) -> Array:
    """Analytic A = df/dx (pendulum_model.hpp:23-35)."""
    return jnp.array(
        [[0.0, 1.0], [(G / L) * jnp.cos(x[0]), -B / (M * L * L)]], dtype=x.dtype
    )


def pendulum_control_jacobian(x: Array, u: Array) -> Array:
    """Analytic B = df/du (pendulum_model.hpp:38-44)."""
    return jnp.array([[0.0], [1.0 / (M * L * L)]], dtype=x.dtype)
