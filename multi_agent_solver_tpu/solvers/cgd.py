"""Constrained gradient descent (single shooting), TPU-native.

Behavioural analogue of the reference's ``solvers/cgd.hpp:24-154``: per outer
iteration, build the augmented-Lagrangian objective, compute the gradient of
the whole-horizon cost w.r.t. every control entry, take an Armijo step along
the negative gradient, clamp to the input box, accept on AL-cost decrease,
then always update multipliers and the penalty (rho *= 1.5, capped at 1e6).

TPU-first deviations:

* The gradient is **exact reverse-mode AD through the rollout** by default --
  one forward + one backward scan -- instead of the reference's
  ``finite_differences_gradient`` which costs ``2 * T * nu`` full rollouts per
  iteration (finite_differences.hpp:17-48; the reason the reference's CGD is
  its slowest solver, README.md:164).  Set ``gradient_mode='fd'`` for the
  reference's FD numerics (still batched into a single launch).
* The Armijo search evaluates all candidate steps in one batched rollout
  (see :mod:`multi_agent_solver_tpu.line_search`).
* Outer iterations run under ``lax.while_loop`` with the convergence test
  ``|old_cost - trial_cost| < tolerance`` applied unconditionally.  (In the
  reference this break is accidentally gated on the ``debug`` flag,
  cgd.hpp:109-113, so reference runs always execute ``max_iterations``;
  with the examples' iteration budgets both behaviours reach the same
  optimum, and an unconditional break strictly reduces work.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constraints import (
    compute_augmented_cost,
    increase_penalty_parameter,
    update_lagrange_multipliers,
)
from ..finite_differences import finite_differences_gradient
from ..integrators import integrate_horizon
from ..line_search import armijo_line_search, projected_armijo_line_search
from ..ocp import OCPSpec
from ..types import Array, SolverParams, get_param, param_flag
from .base import SolveResult, SolverBase, register_solver


@dataclasses.dataclass(frozen=True)
class CGDConfig:
    """Reference: cgd.hpp:32-39 (penalty always restarts at 1.0)."""

    max_iterations: int = 100
    tolerance: float = 1e-6
    penalty_cap: float = 1e6
    gradient_mode: str = "ad"  # 'ad' (exact, fast) or 'fd' (reference parity)
    max_ms: float = 0.0            # host deadline; ignored unless enforced
    enforce_max_ms: bool = False
    # Opt-in host-path transform: fold finite state bounds into AL
    # inequality rows (the reference's CGD ignores state bounds).
    state_bounds_al: bool = False
    # Projected-arc Armijo (param ``projected_ls``): search the CLAMPED ray
    # P(u - alpha g) instead of the reference's unclamped ray whose accepted
    # alpha can be a no-op after clamping (permanent stall at an input-box
    # boundary; see line_search.projected_armijo_line_search).  Off by
    # default for reference parity.
    projected_ls: bool = False
    # Reverse-mode differentiable solve: bounded rematerialized fori_loop
    # instead of while_loop (see solvers/ilqr.py ILQRConfig.differentiable).
    differentiable: bool = False
    debug: bool = False

    @classmethod
    def from_params(cls, params: SolverParams) -> "CGDConfig":
        return cls(
            max_iterations=int(get_param(params, "max_iterations")),
            tolerance=get_param(params, "tolerance"),
            gradient_mode="fd" if param_flag(params, "fd_gradient") else "ad",
            max_ms=get_param(params, "max_ms", 0.0),
            enforce_max_ms=param_flag(params, "enforce_max_ms"),
            state_bounds_al=param_flag(params, "state_bounds_al"),
            projected_ls=param_flag(params, "projected_ls"),
            differentiable=param_flag(params, "differentiable"),
            debug=param_flag(params, "debug"),
        )


def solve_cgd(spec: OCPSpec, config: CGDConfig) -> SolveResult:
    """Pure functional constrained-gradient-descent solve."""
    T = spec.horizon_steps
    dtype = spec.initial_state.dtype

    us0 = spec.initial_controls
    xs0 = spec.rollout(us0)
    eq_mult0 = jnp.zeros((T, spec.eq_dim), dtype)
    ineq_mult0 = jnp.zeros((T, spec.ineq_dim), dtype)
    rho0 = jnp.asarray(1.0, dtype)  # cgd.hpp:37
    aug0 = compute_augmented_cost(spec, xs0, us0, eq_mult0, ineq_mult0, rho0)

    def augmented_objective_fn(eq_mult, ineq_mult, rho):
        def objective(X, U):
            # compute_augmented_cost routes through spec.cost (context-aware).
            return compute_augmented_cost(spec, X, U, eq_mult, ineq_mult, rho)

        return objective

    def gradient(us, eq_mult, ineq_mult, rho):
        if config.gradient_mode == "fd":
            return finite_differences_gradient(
                spec.initial_state,
                us,
                spec.dynamics,
                augmented_objective_fn(eq_mult, ineq_mult, rho),
                spec.dt,
            )
        obj = augmented_objective_fn(eq_mult, ineq_mult, rho)

        def total(u):
            xs = spec.rollout(u)
            return obj(xs, u)

        return jax.grad(total)(us)

    def cond(state):
        us, xs, aug_cost, eq_mult, ineq_mult, rho, it, converged, timed_out = state
        return (it < config.max_iterations) & ~converged & ~timed_out

    def body(state):
        us, xs, aug_cost, eq_mult, ineq_mult, rho, it, _, _ = state
        obj = augmented_objective_fn(eq_mult, ineq_mult, rho)

        grads = gradient(us, eq_mult, ineq_mult, rho)
        if config.projected_ls and spec.has_input_bounds:
            step = projected_armijo_line_search(
                spec.initial_state, us, grads, spec.dynamics, obj, spec.dt,
                spec.input_lower_bounds, spec.input_upper_bounds,
            )
        else:
            step = armijo_line_search(
                spec.initial_state, us, grads, spec.dynamics, obj, spec.dt
            )

        trial_us = us - step * grads
        if spec.has_input_bounds:  # cgd.hpp:85-88
            trial_us = jnp.clip(trial_us, spec.input_lower_bounds, spec.input_upper_bounds)
        trial_xs = spec.rollout(trial_us)
        trial_cost = obj(trial_xs, trial_us)

        old_cost = aug_cost
        better = trial_cost < aug_cost
        us_new = jnp.where(better, trial_us, us)
        xs_new = jnp.where(better, trial_xs, xs)
        aug_new = jnp.where(better, trial_cost, aug_cost)

        # Always update multipliers and penalty, even on reject (cgd.hpp:104-107).
        eq_mult, ineq_mult = update_lagrange_multipliers(
            spec, xs_new, us_new, eq_mult, ineq_mult, rho
        )
        rho = increase_penalty_parameter(rho, spec, xs_new, us_new, config.tolerance)
        rho = jnp.minimum(rho, config.penalty_cap)

        converged = jnp.abs(old_cost - trial_cost) < config.tolerance
        if config.debug:  # per-iteration trace (reference: cgd.hpp:109-113)
            jax.debug.print(
                "CGD iter {it}: aug_cost={c} step={s} rho={r}",
                it=it, c=aug_new, s=step, r=rho,
            )
        if config.enforce_max_ms and config.max_ms > 0:
            from .base import deadline_exceeded

            timed_out = deadline_exceeded()
        else:
            timed_out = jnp.asarray(False)
        return (us_new, xs_new, aug_new, eq_mult, ineq_mult, rho, it + 1,
                converged, timed_out)

    init = (us0, xs0, aug0, eq_mult0, ineq_mult0, rho0,
            jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(False))
    if config.differentiable:
        # Reverse-differentiable bounded loop with the identical fixed point
        # (see solve_ilqr): converged state frozen by the while predicate.
        iter_body = jax.checkpoint(body)

        def fori_body(_, state):
            new_state = iter_body(state)
            keep = cond(state)
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(keep, n, o), new_state, state
            )

        final = jax.lax.fori_loop(0, config.max_iterations, fori_body, init)
        us, xs, aug_cost, eq_mult, ineq_mult, rho, it, converged, _ = final
    else:
        us, xs, aug_cost, eq_mult, ineq_mult, rho, it, converged, _ = (
            jax.lax.while_loop(cond, body, init)
        )

    # The reference reports best_cost as the AL-augmented cost it tracked
    # (cgd.hpp:61, 97-102).  We report the same for parity.
    return SolveResult(
        states=xs,
        controls=us,
        cost=aug_cost,
        iterations=it,
        converged=converged,
        merit=aug_cost,
    )


@register_solver
class CGD(SolverBase):
    """Host-side CGD with the reference's ``set_params``/``solve`` surface."""

    name = "cgd"
    config_cls = CGDConfig
    _solve_fn = staticmethod(solve_cgd)
