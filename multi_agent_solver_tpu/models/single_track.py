"""Kinematic single-track (bicycle) model.

Same physics as the reference's ``examples/models/single_track_model.hpp:23-82``:
state ``(X, Y, psi, v)``, control ``(delta, a)``, wheelbase L = 2.5:

    X_dot = v cos(psi);  Y_dot = v sin(psi);  psi_dot = v tan(delta)/L;  v_dot = a
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array

WHEELBASE = 2.5


def single_track_model(x: Array, u: Array) -> Array:
    psi, v = x[2], x[3]
    delta, a = u[0], u[1]
    return jnp.stack(
        [v * jnp.cos(psi), v * jnp.sin(psi), v * jnp.tan(delta) / WHEELBASE, a]
    )


def single_track_state_jacobian(x: Array, u: Array) -> Array:
    """Analytic A (single_track_model.hpp:51-67)."""
    psi, v = x[2], x[3]
    delta = u[0]
    A = jnp.zeros((4, 4), x.dtype)
    A = A.at[0, 2].set(-v * jnp.sin(psi))
    A = A.at[0, 3].set(jnp.cos(psi))
    A = A.at[1, 2].set(v * jnp.cos(psi))
    A = A.at[1, 3].set(jnp.sin(psi))
    A = A.at[2, 3].set(jnp.tan(delta) / WHEELBASE)
    return A


def single_track_control_jacobian(x: Array, u: Array) -> Array:
    """Analytic B incl. d(psi_dot)/d(delta) = v/(L cos^2 delta)
    (single_track_model.hpp:72-82)."""
    v = x[3]
    delta = u[0]
    B = jnp.zeros((4, 2), x.dtype)
    B = B.at[2, 0].set(v / (WHEELBASE * jnp.cos(delta) ** 2))
    B = B.at[3, 1].set(1.0)
    return B
