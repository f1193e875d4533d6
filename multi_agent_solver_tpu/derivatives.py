"""Derivative oracle system: exact AD by default, FD-parity mode optional.

The reference declares derivative-oracle ``std::function`` aliases
(``types.hpp:42-50``) and installs central-finite-difference defaults for any
oracle the user leaves unset (``ocp.hpp:117-135``).  The TPU-native default is
**automatic differentiation** (``jax.jacfwd`` / ``jax.grad`` / ``jax.hessian``)
-- exact, fused by XLA, and free of the reference's epsilon tuning -- with an
opt-in ``mode="fd"`` that reproduces the reference's stencils and epsilons for
numerical-parity testing (see :mod:`multi_agent_solver_tpu.finite_differences`).

Oracle signatures (all pure functions; trajectory layout is time-major):

* ``fx(x, u) -> [nx, nx]``,  ``fu(x, u) -> [nx, nu]``  -- Jacobians of the
  *continuous-time* dynamics, exactly as the reference supplies to iLQR
  (ilqr.hpp:106-107): the reference feeds these raw continuous Jacobians into
  its Riccati recursion without discretizing them.
* ``lx/lu(x, u, t) -> [n]``, ``lxx/luu(x, u, t) -> [n, n]``,
  ``lux(x, u, t) -> [nu, nx]``
* ``phix(x) -> [nx]``, ``phixx(x) -> [nx, nx]``
* ``eq_gx/eq_gu, ineq_gx, ineq_gu (x, u) -> [m, n]`` (constraint Jacobians)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import finite_differences as fd
from .types import (
    Array,
    ConstraintsFunction,
    MotionModel,
    StageCostFunction,
    TerminalCostFunction,
)


@dataclasses.dataclass(frozen=True)
class Derivatives:
    """Bundle of concrete derivative callables (all static pytree metadata)."""

    fx: Callable[[Array, Array], Array]
    fu: Callable[[Array, Array], Array]
    lx: Callable[[Array, Array, Array], Array]
    lu: Callable[[Array, Array, Array], Array]
    lxx: Callable[[Array, Array, Array], Array]
    luu: Callable[[Array, Array, Array], Array]
    lux: Callable[[Array, Array, Array], Array]
    phix: Callable[[Array], Array]
    phixx: Callable[[Array], Array]
    eq_gx: Optional[Callable[[Array, Array], Array]] = None
    eq_gu: Optional[Callable[[Array, Array], Array]] = None
    ineq_gx: Optional[Callable[[Array, Array], Array]] = None
    ineq_gu: Optional[Callable[[Array, Array], Array]] = None
    # Jacobians of the DISCRETE one-step map x_{t+1} = step(x_t, u_t) -- i.e.
    # differentiated through the RK4 integrator.  The reference has no such
    # oracle (its iLQR feeds raw continuous Jacobians into the Riccati
    # recursion, ilqr.hpp:106-119); these power the exact 'discrete' Jacobian
    # mode of the TPU iLQR.  Installed by OCP.spec() once dt is known.
    step_fx: Optional[Callable[[Array, Array], Array]] = None
    step_fu: Optional[Callable[[Array, Array], Array]] = None

    def replace(self, **kwargs) -> "Derivatives":
        return dataclasses.replace(self, **kwargs)


def _ad_derivatives(
    dynamics: MotionModel,
    stage_cost: StageCostFunction,
    terminal_cost: TerminalCostFunction,
    equality_constraints: Optional[ConstraintsFunction],
    inequality_constraints: Optional[ConstraintsFunction],
) -> Derivatives:
    """Exact derivatives via JAX AD (forward-mode for the small Jacobians)."""
    return Derivatives(
        fx=jax.jacfwd(dynamics, argnums=0),
        fu=jax.jacfwd(dynamics, argnums=1),
        lx=jax.grad(stage_cost, argnums=0),
        lu=jax.grad(stage_cost, argnums=1),
        lxx=jax.jacfwd(jax.grad(stage_cost, argnums=0), argnums=0),
        luu=jax.jacfwd(jax.grad(stage_cost, argnums=1), argnums=1),
        lux=jax.jacfwd(jax.grad(stage_cost, argnums=1), argnums=0),
        phix=jax.grad(terminal_cost),
        phixx=jax.jacfwd(jax.grad(terminal_cost)),
        eq_gx=jax.jacfwd(equality_constraints, argnums=0) if equality_constraints else None,
        eq_gu=jax.jacfwd(equality_constraints, argnums=1) if equality_constraints else None,
        ineq_gx=jax.jacfwd(inequality_constraints, argnums=0) if inequality_constraints else None,
        ineq_gu=jax.jacfwd(inequality_constraints, argnums=1) if inequality_constraints else None,
    )


def _fd_derivatives(
    dynamics: MotionModel,
    stage_cost: StageCostFunction,
    terminal_cost: TerminalCostFunction,
    equality_constraints: Optional[ConstraintsFunction],
    inequality_constraints: Optional[ConstraintsFunction],
) -> Derivatives:
    """Finite differences with the reference's exact epsilons (parity mode)."""
    return Derivatives(
        fx=lambda x, u: fd.fd_jacobian(lambda y: dynamics(y, u), x, eps=1e-6),
        fu=lambda x, u: fd.fd_jacobian(lambda w: dynamics(x, w), u, eps=1e-6),
        lx=lambda x, u, t: fd.fd_gradient(lambda y: stage_cost(y, u, t), x, eps=1e-6),
        lu=lambda x, u, t: fd.fd_gradient(lambda w: stage_cost(x, w, t), u, eps=1e-6),
        lxx=lambda x, u, t: fd.fd_hessian(lambda y: stage_cost(y, u, t), x, eps=1e-5),
        luu=lambda x, u, t: fd.fd_hessian(lambda w: stage_cost(x, w, t), u, eps=1e-5),
        lux=lambda x, u, t: fd.fd_cross_term(lambda y, w: stage_cost(y, w, t), x, u, eps=1e-6),
        phix=lambda x: fd.fd_gradient(terminal_cost, x, eps=1e-6),
        phixx=lambda x: fd.fd_hessian(terminal_cost, x, eps=1e-5),
        eq_gx=(
            (lambda x, u: fd.fd_jacobian(lambda y: equality_constraints(y, u), x, eps=1e-6))
            if equality_constraints
            else None
        ),
        eq_gu=(
            (lambda x, u: fd.fd_jacobian(lambda w: equality_constraints(x, w), u, eps=1e-6))
            if equality_constraints
            else None
        ),
        ineq_gx=(
            (lambda x, u: fd.fd_jacobian(lambda y: inequality_constraints(y, u), x, eps=1e-6))
            if inequality_constraints
            else None
        ),
        ineq_gu=(
            (lambda x, u: fd.fd_jacobian(lambda w: inequality_constraints(x, w), u, eps=1e-6))
            if inequality_constraints
            else None
        ),
    )


_DERIVATIVES_CACHE: dict = {}


def make_derivatives(
    dynamics: MotionModel,
    stage_cost: StageCostFunction,
    terminal_cost: TerminalCostFunction,
    equality_constraints: Optional[ConstraintsFunction] = None,
    inequality_constraints: Optional[ConstraintsFunction] = None,
    mode: str = "ad",
    **overrides,
) -> Derivatives:
    """Build the oracle bundle; any oracle may be overridden with an analytic
    callable (the analogue of the reference's optional analytic oracles,
    ``ocp.hpp:70-80``).

    ``overrides`` keys match :class:`Derivatives` field names.

    Results are memoized on the identity of every input callable: problems
    built from the same function objects share ONE bundle, which is what
    makes their specs compare equal (identical pytree statics) and lets
    homogeneous agents stack into vmapped lanes instead of per-agent
    recompiles.
    """
    cache_key = (
        dynamics, stage_cost, terminal_cost,
        equality_constraints, inequality_constraints, mode,
        tuple(sorted(overrides.items(), key=lambda kv: kv[0])),
    )
    try:
        cached = _DERIVATIVES_CACHE.get(cache_key)
    except TypeError:            # unhashable override value
        cached = None
        cache_key = None
    if cached is not None:
        return cached
    if mode == "ad":
        derivs = _ad_derivatives(
            dynamics, stage_cost, terminal_cost, equality_constraints, inequality_constraints
        )
    elif mode == "fd":
        derivs = _fd_derivatives(
            dynamics, stage_cost, terminal_cost, equality_constraints, inequality_constraints
        )
    else:
        raise ValueError(f"unknown derivative mode '{mode}' (expected 'ad' or 'fd')")

    overrides = {k: v for k, v in overrides.items() if v is not None}
    if overrides:
        unknown = set(overrides) - {f.name for f in dataclasses.fields(Derivatives)}
        if unknown:
            raise ValueError(f"unknown derivative overrides: {sorted(unknown)}")
        derivs = derivs.replace(**overrides)
    if cache_key is not None:
        _DERIVATIVES_CACHE[cache_key] = derivs
    return derivs
