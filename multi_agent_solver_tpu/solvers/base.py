"""Common solver infrastructure: result pytree, host-side solver protocol.

The reference models solvers as a ``std::variant<iLQR, CGD, OSQP,
OSQPCollocation>`` with free ``solve`` / ``set_params`` visitors
(``solvers/solver.hpp:17-45``).  Here each solver is

* a **pure jittable function** ``solve_<name>(spec, config) -> SolveResult``
  (the TPU compute path: fully traceable, vmappable, shardable), and
* a thin **host class** with the reference's ``set_params(dict)`` /
  ``solve(problem)`` surface that caches the jitted executable and writes
  results back into the mutable :class:`~multi_agent_solver_tpu.ocp.OCP`.

``make_solver(name)`` is the registry-based factory mirroring
``examples::make_solver`` (example_utils.hpp:77-95).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Type

import jax
import jax.numpy as jnp
from ..utils.pytree import pytree_dataclass, field as pytree_field

from ..ocp import OCP, OCPSpec
from ..types import Array, SolverParams


@pytree_dataclass
class SolveResult:
    """Common solver output pytree (vmappable).

    ``states``/``controls`` are the accepted best trajectory, ``cost`` the true
    (un-augmented) objective value -- the analogue of the reference mutating
    ``best_states`` / ``best_controls`` / ``best_cost`` on the OCP.
    """

    states: Array          # [T+1, nx]
    controls: Array        # [T, nu]
    cost: Array            # scalar
    iterations: Array      # int32 scalar: outer iterations executed
    converged: Array       # bool scalar
    # Optional solver-specific diagnostics (zeros when not applicable)
    merit: Array = 0.0
    eq_violation: Array = 0.0
    ineq_violation: Array = 0.0


# ---------------------------------------------------------------------------
# Opt-in host wall-clock deadline (reference max_ms semantics)
# ---------------------------------------------------------------------------
#
# The reference checks elapsed milliseconds at the top of every outer
# iteration and stops, keeping the best-so-far (ilqr.hpp:84-90,
# osqp.hpp:122-132, osqp_collocation.hpp:470-477).  Inside a compiled TPU
# program a wall clock is not traceable, and on remote backends the first
# call's budget would be consumed by compilation -- so by default ``max_ms``
# is accepted and ignored (documented in docs/DESIGN.md).  Passing
# ``enforce_max_ms=1`` restores the reference behavior on the host solve
# path: each outer iteration reads the host clock through ``io_callback``
# and raises a stop flag once the deadline passes.
#
# The deadline itself lives in a thread-local slot (not the trace) so the
# jitted executable stays cached across solves; ``SolverBase.solve`` arms it
# right before each call.  Batched strategy sweeps never include the
# callback (iteration budgets are the deadline there).

import time as _time

import numpy as _np


class _DeadlineSlot:
    # Plain module state, NOT thread-local: XLA executes io_callbacks on its
    # own callback thread, which would see a fresh thread-local.  Host-side
    # solve() calls are sequential per process, which is the supported use.
    value = None


_DEADLINE = _DeadlineSlot()


def _deadline_cb():
    d = _DEADLINE.value
    return _np.bool_(d is not None and _time.perf_counter() > d)


def deadline_exceeded() -> Array:
    """Traced host-clock check against the armed deadline (see above)."""
    from jax.experimental import io_callback

    return io_callback(
        _deadline_cb, jax.ShapeDtypeStruct((), jnp.bool_), ordered=True
    )


def arm_deadline(max_ms: float) -> None:
    _DEADLINE.value = (
        _time.perf_counter() + max_ms / 1000.0 if max_ms and max_ms > 0 else None
    )


class SolverBase:
    """Host-side solver shim with the reference's API surface."""

    name: str = "base"
    config_cls: Optional[type] = None

    def __init__(self, **params):
        self.config = self.config_cls() if self.config_cls else None
        self._jitted: Dict[Any, Callable] = {}
        if params:
            self.set_params(params)

    def set_params(self, params: SolverParams) -> None:
        """Accept a reference-style ``{name: float}`` map (solver.hpp:34-38)."""
        self.config = self.config_cls.from_params(params)

    # -- functional core (override) ------------------------------------
    def solve_spec(self, spec: OCPSpec) -> SolveResult:
        """Jit-compiled functional solve on a frozen spec."""
        key = self.config
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(lambda s: self._solve_fn(s, self.config))
            self._jitted[key] = fn
        return fn(spec)

    @staticmethod
    def _solve_fn(spec: OCPSpec, config) -> SolveResult:  # pragma: no cover
        raise NotImplementedError

    @classmethod
    def _solve_batched_fn(cls, specs: OCPSpec, config) -> SolveResult:
        """Solve a spec whose leaves carry a leading batch axis.

        Default: vmap of the per-problem solver.  Solvers with fused batched
        kernels (iLQR) override this -- strategies and the parallel layer
        route through it so agent sweeps hit the fast path.
        """
        return jax.vmap(lambda s: cls._solve_fn(s, config))(specs)

    # -- reference-style host API ---------------------------------------
    def solve(self, problem: OCP) -> SolveResult:
        """Solve and write ``best_states`` / ``best_controls`` / ``best_cost``
        back into the problem, like the reference's mutating ``solve(OCP&)``."""
        if getattr(self.config, "enforce_max_ms", False):
            arm_deadline(getattr(self.config, "max_ms", 0.0))
        spec = problem.spec()
        if getattr(self.config, "state_bounds_al", False):
            # Opt-in: fold finite state bounds into AL inequality rows (the
            # reference's iLQR/CGD ignore state bounds entirely).
            from ..ocp import with_state_bound_constraints

            spec = with_state_bound_constraints(spec)
        result = self.solve_spec(spec)
        problem.set_result(result.states, result.controls, result.cost)
        return result


# ---------------------------------------------------------------------------
# Registry / factory (example_utils.hpp:19-95)
# ---------------------------------------------------------------------------

_SOLVERS: Dict[str, Type[SolverBase]] = {}


def register_solver(cls: Type[SolverBase]) -> Type[SolverBase]:
    _SOLVERS[cls.name] = cls
    return cls


def normalize_key(value: str) -> str:
    """Lowercase and strip non-alphanumerics (example_utils.hpp:19-30)."""
    return re.sub(r"[^a-z0-9]", "", value.lower())


_SOLVER_ALIASES = {
    # example_utils.hpp:32-49 (incl. primal-dual iLQR aliases)
    "ilqr": "ilqr",
    "primaldualilqr": "ilqr",
    "pdilqr": "ilqr",
    "cgd": "cgd",
    "osqp": "osqp",
    "osqpcollocation": "osqp_collocation",
    # Beyond-reference sampling solver (no reference counterpart).
    "mppi": "mppi",
    "pathintegral": "mppi",
}


def canonical_solver_name(name: str) -> str:
    key = normalize_key(name)
    if key not in _SOLVER_ALIASES:
        raise ValueError(f"Unknown solver '{name}'.")
    return _SOLVER_ALIASES[key]


def available_solver_names():
    return sorted(_SOLVERS.keys())


def make_solver(name: str, params: Optional[SolverParams] = None) -> SolverBase:
    canonical = canonical_solver_name(name)
    if canonical not in _SOLVERS:
        raise ValueError(f"Solver '{canonical}' is not registered.")
    solver = _SOLVERS[canonical]()
    if params is not None:
        solver.set_params(params)
    return solver


def make_solver_like(proto: SolverBase) -> SolverBase:
    """Default-construct the same solver type (nash.hpp:17-21)."""
    return type(proto)()
