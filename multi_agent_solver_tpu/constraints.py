"""Augmented-Lagrangian constraint helpers.

TPU-native analogue of the reference's ``constraint_helpers.hpp:17-114``.  All
per-timestep loops are replaced with ``vmap`` over the horizon, so constraint
residuals for all T stages evaluate in one fused launch; the helpers are pure
functions over explicit multiplier state (the reference mutates
solver-resident multiplier buffers).

Multiplier trajectories are time-major: ``[T, m]``.

Conventions (identical to the reference):

* equality AL term     ``lambda^T g + (rho/2) ||g||^2``        (lines 28-31)
* inequality PHR term  ``(1/2rho)(||max(0, lambda + rho g)||^2 - ||lambda||^2)``
  (lines 38-43)
* multiplier updates   ``lambda += rho g``  /  ``lambda = max(0, lambda + rho g)``
  (lines 60-73)
* penalty schedule     ``rho *= 1.5`` while violation norms exceed tolerance
  (lines 79-105)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .types import Array, ConstraintsFunction


def eval_constraints_horizon(constraint: ConstraintsFunction, states: Array, controls: Array) -> Array:
    """Evaluate a per-stage constraint over the whole horizon: ``[T, m]``.

    ``states`` is ``[T+1, nx]``; constraints are evaluated at ``(x_t, u_t)``
    for ``t = 0..T-1`` exactly as the reference loops do.
    """
    return jax.vmap(constraint)(states[:-1], controls)


def equality_al_term(residuals: Array, multipliers: Array, rho: Array) -> Array:
    """Sum over the horizon of ``lambda^T g + (rho/2)||g||^2`` (lines 28-31)."""
    return jnp.sum(multipliers * residuals) + 0.5 * rho * jnp.sum(residuals**2)


def inequality_phr_term(residuals: Array, multipliers: Array, rho: Array) -> Array:
    """Sum over the horizon of the PHR inequality term (lines 38-43)."""
    combined_plus = jnp.maximum(multipliers + rho * residuals, 0.0)
    return (0.5 / rho) * jnp.sum(combined_plus**2 - multipliers**2)


def compute_augmented_cost(
    spec,
    states: Array,
    controls: Array,
    eq_multipliers: Optional[Array],
    ineq_multipliers: Optional[Array],
    rho: Array,
) -> Array:
    """Objective plus AL terms (reference: compute_augmented_cost, lines 17-49)."""
    cost = spec.cost(states, controls)   # context-aware objective
    if spec.eq_dim > 0:
        g = eval_constraints_horizon(spec.equality_constraints, states, controls)
        cost = cost + equality_al_term(g, eq_multipliers, rho)
    if spec.ineq_dim > 0:
        h = eval_constraints_horizon(spec.inequality_constraints, states, controls)
        cost = cost + inequality_phr_term(h, ineq_multipliers, rho)
    return cost


def update_lagrange_multipliers(
    spec,
    states: Array,
    controls: Array,
    eq_multipliers: Optional[Array],
    ineq_multipliers: Optional[Array],
    rho: Array,
) -> Tuple[Optional[Array], Optional[Array]]:
    """Dual ascent updates (reference: update_lagrange_multipliers, lines 52-76)."""
    new_eq, new_ineq = eq_multipliers, ineq_multipliers
    if spec.eq_dim > 0:
        g = eval_constraints_horizon(spec.equality_constraints, states, controls)
        new_eq = eq_multipliers + rho * g
    if spec.ineq_dim > 0:
        h = eval_constraints_horizon(spec.inequality_constraints, states, controls)
        new_ineq = jnp.maximum(ineq_multipliers + rho * h, 0.0)
    return new_eq, new_ineq


def violation_norms(spec, states: Array, controls: Array) -> Tuple[Array, Array]:
    """Whole-horizon constraint violation norms.

    ``sqrt(sum_t ||g_t||^2)`` for equalities, ``sqrt(sum_t ||max(0,h_t)||^2)``
    for inequalities (reference: lines 86-101; also ilqr.hpp:236-257).
    """
    zero = jnp.asarray(0.0, states.dtype)
    eq_norm = ineq_norm = zero
    if spec.eq_dim > 0:
        g = eval_constraints_horizon(spec.equality_constraints, states, controls)
        eq_norm = jnp.sqrt(jnp.sum(g**2))
    if spec.ineq_dim > 0:
        h = eval_constraints_horizon(spec.inequality_constraints, states, controls)
        ineq_norm = jnp.sqrt(jnp.sum(jnp.maximum(h, 0.0) ** 2))
    return eq_norm, ineq_norm


def increase_penalty_parameter(
    rho: Array, spec, states: Array, controls: Array, tolerance: float, factor: float = 1.5
) -> Array:
    """``rho *= factor`` when constraints are violated (reference lines 79-105)."""
    eq_norm, ineq_norm = violation_norms(spec, states, controls)
    violated = (eq_norm > tolerance) | (ineq_norm > tolerance)
    return jnp.where(violated, rho * factor, rho)


def clamp_controls(controls: Array, lower: Array, upper: Array) -> Array:
    """Elementwise box clamp (reference: clamp_controls, lines 107-114)."""
    return jnp.clip(controls, lower, upper)
