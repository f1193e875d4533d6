"""Line searches over whole-horizon control perturbations.

TPU-native analogue of the reference's ``line_search.hpp:30-119``.  The
reference tries step sizes sequentially (halving until acceptance); here every
candidate step is evaluated **in parallel** -- one batched rollout where each
vector lane carries a different alpha -- and the accepted alpha is the largest
candidate passing the test.  Because the reference tests alphas in decreasing
order and stops at the first success, selecting the largest passing candidate
is *exactly equivalent*, while mapping far better onto the VPU/MXU than a
data-dependent halving loop.

Semantics preserved from the reference:

* Armijo (line_search.hpp:30-70): start 1.0, beta 0.5, c1 1e-6, directional
  derivative ``-sum(g^2)`` (line 42); when every candidate fails, return the
  first alpha below 1e-8 (the reference's loop exits *after* halving).
* Backtracking (73-109): accept on plain decrease.
* Constant (112-119).
"""

from __future__ import annotations

import math
from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from .integrators import integrate_horizon, integrate_rk4
from .types import Array


def _alpha_candidates(initial_step_size: float, beta: float, floor: float = 1e-8):
    """Static ladder of candidate steps: initial * beta^k for k = 0..K, where
    K is the first k with alpha < floor (the reference's exit value)."""
    alphas = []
    alpha = initial_step_size
    while alpha >= floor:
        alphas.append(alpha)
        alpha *= beta
    alphas.append(alpha)  # the sub-floor value the reference returns on failure
    return jnp.asarray(alphas)


def get_parameter(parameters: Optional[Mapping[str, float]], key: str, default: float) -> float:
    """Map lookup with default (reference: line_search.hpp:22-27)."""
    if parameters is None:
        return default
    return float(parameters.get(key, default))


def _batched_trial_costs(initial_state, controls, gradients, dynamics, objective_function, dt, alphas):
    """Trial costs for ``u - alpha * g`` across all alphas in one batched rollout."""

    def trial_cost(alpha):
        trial_controls = controls - alpha * gradients
        trial_states = integrate_horizon(initial_state, trial_controls, dt, dynamics, integrate_rk4)
        return objective_function(trial_states, trial_controls)

    return jax.vmap(trial_cost)(alphas)


def armijo_line_search(
    initial_state: Array,
    controls: Array,
    gradients: Array,
    dynamics,
    objective_function,
    dt: float,
    parameters: Optional[Mapping[str, float]] = None,
) -> Array:
    """Armijo condition line search (reference: line_search.hpp:30-70)."""
    initial_step_size = get_parameter(parameters, "initial_step_size", 1.0)
    beta = get_parameter(parameters, "beta", 0.5)
    c1 = get_parameter(parameters, "c1", 1e-6)

    alphas = _alpha_candidates(initial_step_size, beta)
    ref_states = integrate_horizon(initial_state, controls, dt, dynamics, integrate_rk4)
    cost_ref = objective_function(ref_states, controls)
    directional_derivative = -jnp.sum(gradients * gradients)

    costs = _batched_trial_costs(
        initial_state, controls, gradients, dynamics, objective_function, dt, alphas
    )
    accept = costs <= cost_ref + c1 * alphas * directional_derivative
    # Largest alpha (lowest index) passing; fall back to the sub-floor alpha.
    idx = jnp.argmax(accept)
    found = jnp.any(accept[:-1])
    return jnp.where(found, alphas[idx], alphas[-1])


def projected_armijo_line_search(
    initial_state: Array,
    controls: Array,
    gradients: Array,
    dynamics,
    objective_function,
    dt: float,
    lower: Array,
    upper: Array,
    parameters: Optional[Mapping[str, float]] = None,
) -> Array:
    """Projected-arc Armijo search (beyond the reference; docs/PARITY.md).

    The reference's CGD line-searches the UNCLAMPED ray ``u - alpha g`` and
    clamps only the final step (cgd.hpp:84-92, line_search.hpp:30-70).  At an
    input-box boundary the unclamped Armijo model keeps promising descent the
    clamped step cannot deliver, so the accepted alpha yields no improvement
    and the iteration is a fixed point: on the circular-track benchmark the
    reference CGD stalls at 129.079 per agent vs iLQR's 1.876
    (tests/test_cgd_parity.py mirrors the stall exactly).  Searching the
    projected arc ``P(u - alpha g)`` with sufficient decrease measured
    through the projected displacement -- the standard projected-gradient
    Armijo rule -- restores convergence to a box-stationary point.  All
    candidates evaluate in one batched rollout, like the other searches.
    """
    initial_step_size = get_parameter(parameters, "initial_step_size", 1.0)
    beta = get_parameter(parameters, "beta", 0.5)
    c1 = get_parameter(parameters, "c1", 1e-6)

    alphas = _alpha_candidates(initial_step_size, beta)
    ref_states = integrate_horizon(initial_state, controls, dt, dynamics, integrate_rk4)
    cost_ref = objective_function(ref_states, controls)

    def trial(alpha):
        trial_controls = jnp.clip(controls - alpha * gradients, lower, upper)
        trial_states = integrate_horizon(
            initial_state, trial_controls, dt, dynamics, integrate_rk4
        )
        cost = objective_function(trial_states, trial_controls)
        disp2 = jnp.sum((trial_controls - controls) ** 2)
        return cost, disp2

    costs, disp2 = jax.vmap(trial)(alphas)
    accept = costs <= cost_ref - (c1 / jnp.maximum(alphas, 1e-12)) * disp2
    idx = jnp.argmax(accept)
    found = jnp.any(accept[:-1])
    return jnp.where(found, alphas[idx], alphas[-1])


def backtracking_line_search(
    initial_state: Array,
    controls: Array,
    gradients: Array,
    dynamics,
    objective_function,
    dt: float,
    parameters: Optional[Mapping[str, float]] = None,
) -> Array:
    """Plain-decrease backtracking (reference: line_search.hpp:73-109)."""
    initial_step_size = get_parameter(parameters, "initial_step_size", 1.0)
    beta = get_parameter(parameters, "beta", 0.5)

    alphas = _alpha_candidates(initial_step_size, beta)
    ref_states = integrate_horizon(initial_state, controls, dt, dynamics, integrate_rk4)
    cost_ref = objective_function(ref_states, controls)

    costs = _batched_trial_costs(
        initial_state, controls, gradients, dynamics, objective_function, dt, alphas
    )
    accept = costs < cost_ref
    idx = jnp.argmax(accept)
    found = jnp.any(accept[:-1])
    return jnp.where(found, alphas[idx], alphas[-1])


def constant_line_search(
    initial_state: Array,
    controls: Array,
    gradients: Array,
    dynamics,
    objective_function,
    dt: float,
    parameters: Optional[Mapping[str, float]] = None,
) -> Array:
    """Constant step (reference: line_search.hpp:112-119)."""
    return jnp.asarray(get_parameter(parameters, "step_size", 0.1))


LINE_SEARCHES = {
    "armijo": armijo_line_search,
    "backtracking": backtracking_line_search,
    "constant": constant_line_search,
}
