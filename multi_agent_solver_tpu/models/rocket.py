"""Vertical rocket model with fuel-mass state.

Same physics as the reference's ``examples/models/rocket_model.hpp:12-63``:
state ``(h, v, m)``, control ``(thrust,)``,

    h_dot = v
    v_dot = thrust / max(m, 1e-6) - g
    m_dot = -thrust / v_exhaust
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..types import Array


@dataclasses.dataclass(frozen=True)
class RocketParameters:
    """Reference defaults: rocket_model.hpp:12-17."""

    initial_mass: float = 1.0
    gravity: float = 9.81
    exhaust_velocity: float = 25.0


def make_rocket_dynamics(params: RocketParameters):
    def dynamics(x: Array, u: Array) -> Array:
        mass = jnp.maximum(x[2], 1e-6)
        thrust = u[0]
        return jnp.stack(
            [x[1], thrust / mass - params.gravity, -thrust / params.exhaust_velocity]
        )

    return dynamics


def make_rocket_state_jacobian(params: RocketParameters):
    """Analytic A incl. d(v_dot)/dm = -thrust/m^2 (rocket_model.hpp:41-53)."""

    def jac(x: Array, u: Array) -> Array:
        mass = jnp.maximum(x[2], 1e-6)
        thrust = u[0]
        A = jnp.zeros((3, 3), x.dtype)
        A = A.at[0, 1].set(1.0)
        A = A.at[1, 2].set(-thrust / (mass * mass))
        return A

    return jac


def make_rocket_control_jacobian(params: RocketParameters):
    """Analytic B (rocket_model.hpp:56-63)."""

    def jac(x: Array, u: Array) -> Array:
        mass = jnp.maximum(x[2], 1e-6)
        B = jnp.zeros((3, 1), x.dtype)
        B = B.at[1, 0].set(1.0 / mass)
        B = B.at[2, 0].set(-1.0 / params.exhaust_velocity)
        return B

    return jac
