"""Linear-quadratic building blocks for LQR-style problems.

The reference's LQR example builds ``x_dot = A x + B u`` dynamics and
quadratic costs inline (``examples/multi_agent_lqr.cpp:21-80``); these
factories provide the same pieces as reusable pure functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Array


def make_linear_dynamics(A: Array, B: Array):
    """Continuous dynamics f(x, u) = A x + B u."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)

    def dynamics(x: Array, u: Array) -> Array:
        return A @ x + B @ u

    return dynamics


def quadratic_stage_cost(Q: Array, R: Array):
    """l(x, u, t) = x'Qx + u'Ru (multi_agent_lqr.cpp:49-51)."""
    Q = jnp.asarray(Q)
    R = jnp.asarray(R)

    def stage(x: Array, u: Array, t) -> Array:
        return x @ Q @ x + u @ R @ u

    return stage


def quadratic_terminal_cost(Qf: Array):
    """lT(x) = x'Qf x (multi_agent_lqr.cpp:68)."""
    Qf = jnp.asarray(Qf)

    def terminal(x: Array) -> Array:
        return x @ Qf @ x

    return terminal
