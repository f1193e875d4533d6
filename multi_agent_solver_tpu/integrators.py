"""Fixed-step ODE integrators and horizon rollouts.

TPU-native analogue of the reference's ``integrator.hpp``:

* ``integrate_euler`` / ``integrate_rk4``  -- single steps
  (reference: ``integrator.hpp:12-28``)
* ``integrate_horizon``                    -- whole-horizon rollout as a
  ``lax.scan`` (reference: a sequential C++ loop, ``integrator.hpp:31-48``)

All functions are pure, jittable, differentiable, and vmappable over any
leading batch axes of ``initial_state`` / ``controls``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .types import Array, MotionModel

Integrator = Callable[[Array, Array, float, MotionModel], Array]


def integrate_euler(state: Array, control: Array, dt: float, dynamics: MotionModel) -> Array:
    """Single explicit-Euler step (reference: integrator.hpp:12-16)."""
    return state + dt * dynamics(state, control)


def integrate_rk4(state: Array, control: Array, dt: float, dynamics: MotionModel) -> Array:
    """Single classic RK4 step (reference: integrator.hpp:19-28).

    The control is held constant over the step, exactly as in the reference.
    """
    k1 = dynamics(state, control)
    k2 = dynamics(state + 0.5 * dt * k1, control)
    k3 = dynamics(state + 0.5 * dt * k2, control)
    k4 = dynamics(state + dt * k3, control)
    return state + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


INTEGRATORS = {
    "euler": integrate_euler,
    "rk4": integrate_rk4,
}


def integrate_horizon(
    initial_state: Array,
    controls: Array,
    dt: float,
    dynamics: MotionModel,
    step: Integrator = integrate_rk4,
) -> Array:
    """Roll out the horizon: returns states of shape ``[T+1, nx]``.

    Reference: ``integrate_horizon`` (integrator.hpp:31-48), which all call
    sites invoke with RK4.  Implemented as a ``lax.scan`` so the rollout is a
    single fused XLA loop (compiler-friendly, constant memory, reverse-mode
    differentiable).
    """

    def body(state, control):
        nxt = step(state, control, dt, dynamics)
        return nxt, nxt

    _, states = jax.lax.scan(body, initial_state, controls)
    return jnp.concatenate([initial_state[None, :], states], axis=0)
