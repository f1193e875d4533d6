"""Heterogeneous-agent stacking via padding + type-indicator states.

The reference allows every agent its own dynamics/cost and dimensions
(``multi_agent_problem.hpp:44-49``); its Nash sweeps simply loop over agents
on CPU threads, so heterogeneity costs nothing there.  On TPU the batched
sweep wants ONE compiled program over stacked lanes, which requires uniform
shapes and shared spec statics.  This module makes mixed agent types fit
that mold:

* **Pad** every lane to ``nx_max`` / ``nu_max`` (zero-padded states and
  controls), and append ``K`` *type-indicator* dims to the state whose
  dynamics are identically zero -- each lane's indicator block holds a
  one-hot of its agent type, so the type travels through rollouts,
  linearizations, and kernels as plain data.  No solver, kernel, or mesh
  path needs to know heterogeneity exists.
* **Dispatch** statics: one shared dynamics/cost/constraint function per
  *set* of types, computing ``sum_k onehot[k] * pad(f_k(x[:nx_k], u[:nu_k]))``.
  Under ``vmap`` this evaluates all K branches per lane and selects -- the
  TPU-friendly realization of per-lane control flow (no divergence, all
  MXU-shaped work).  Builders are memoized on the type tuple so specs stay
  identity-stable and jitted sweeps never retrace.
* Padded control dims get a ``0.5 * u_pad^2`` regularizer in the dispatch
  stage cost.  Padded controls start at zero, have zero dynamics/cost
  coupling, and the regularizer keeps the Riccati/QP control Hessian
  positive definite in the padded block, so they remain exactly zero and
  contribute exactly zero cost.
* Padded equality-constraint rows evaluate to ``0`` (satisfied), padded
  inequality rows to ``-1`` (strictly satisfied).

Composes with inter-agent coupling: the dispatch stage cost is an ordinary
``(x, u, t)`` stage cost, so ``with_context_cost``/``make_coupled_stage``
wrap it exactly like a homogeneous one.  The user's ``inter_agent_cost``
then receives *padded* state vectors; it must read only dims shared across
types (e.g. leading position dims), which the examples' collision costs do.

Eligibility: all agents must share ``horizon_steps``, ``dt``,
``derivative_mode``, the synthesized objective, and have no per-agent
``context``.  Anything else falls back to the host loop.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..derivatives import make_derivatives
from ..multi_agent import MultiAgentProblem
from ..ocp import OCPSpec, _step_jacobians, _synthesized_objective

_BIG = 1e30  # "unbounded" sentinel for lanes whose type has no bound


class PadMeta(NamedTuple):
    """How to slice padded stacked results back to per-agent shapes."""

    state_dims: Tuple[int, ...]    # true nx per lane
    control_dims: Tuple[int, ...]  # true nu per lane
    n_types: int
    nx_max: int                    # padded physical state dim (excl. indicators)
    nu_max: int


def _type_signature(spec: OCPSpec):
    """Static identity of an agent's problem structure (one entry per type)."""
    return (
        spec.dynamics,
        spec.stage_cost,
        spec.terminal_cost,
        spec.equality_constraints,
        spec.inequality_constraints,
        spec.state_dim,
        spec.control_dim,
        spec.eq_dim,
        spec.ineq_dim,
    )


def paddable(specs: Sequence[OCPSpec]) -> bool:
    """True when mixed-type agents can share one padded stacked spec."""
    first = specs[0]
    return all(
        s.horizon_steps == first.horizon_steps
        and s.dt == first.dt
        and s.derivative_mode == first.derivative_mode
        and s.objective_is_default
        and s.context is None
        for s in specs
    )


@functools.lru_cache(maxsize=None)
def _dispatch_functions(type_sigs, nx_max: int, nu_max: int):
    """Shared dispatch statics for a tuple of agent-type signatures.

    Memoized on the type tuple (function identities + dims) so every problem
    built from the same mix produces identical spec statics -- the condition
    for jit-cache hits across sweeps, MPC steps, and mesh shards.
    """
    K = len(type_sigs)
    dyns = [s[0] for s in type_sigs]
    stages = [s[1] for s in type_sigs]
    terms = [s[2] for s in type_sigs]
    eqs = [s[3] for s in type_sigs]
    ineqs = [s[4] for s in type_sigs]
    nxs = [s[5] for s in type_sigs]
    nus = [s[6] for s in type_sigs]
    eq_dims = [s[7] for s in type_sigs]
    ineq_dims = [s[8] for s in type_sigs]
    eq_max = max(eq_dims)
    ineq_max = max(ineq_dims)

    def dynamics(x, u):
        sel = x[nx_max:]
        dx = jnp.zeros((nx_max,), x.dtype)
        for k in range(K):
            fk = dyns[k](x[: nxs[k]], u[: nus[k]])
            dx = dx + sel[k] * jnp.pad(fk, (0, nx_max - nxs[k]))
        return jnp.concatenate([dx, jnp.zeros((K,), x.dtype)])

    def stage_cost(x, u, t):
        sel = x[nx_max:]
        total = jnp.asarray(0.0, x.dtype)
        for k in range(K):
            pad_reg = 0.5 * jnp.sum(u[nus[k]:] ** 2)
            total = total + sel[k] * (stages[k](x[: nxs[k]], u[: nus[k]], t) + pad_reg)
        return total

    def terminal_cost(x):
        sel = x[nx_max:]
        total = jnp.asarray(0.0, x.dtype)
        for k in range(K):
            total = total + sel[k] * terms[k](x[: nxs[k]])
        return total

    def _constraint_dispatch(fns, dims, out_dim, pad_value):
        def dispatch(x, u):
            sel = x[nx_max:]
            out = jnp.zeros((out_dim,), x.dtype)
            for k in range(K):
                if fns[k] is None:
                    gk = jnp.full((out_dim,), pad_value, x.dtype)
                else:
                    gk = jnp.pad(
                        fns[k](x[: nxs[k]], u[: nus[k]]),
                        (0, out_dim - dims[k]),
                        constant_values=pad_value,
                    )
                out = out + sel[k] * gk
            return out

        return dispatch

    eq_fn = (
        _constraint_dispatch(eqs, eq_dims, eq_max, 0.0) if eq_max > 0 else None
    )
    ineq_fn = (
        _constraint_dispatch(ineqs, ineq_dims, ineq_max, -1.0)
        if ineq_max > 0
        else None
    )
    return dynamics, stage_cost, terminal_cost, eq_fn, ineq_fn, eq_max, ineq_max


def _pad_vec(vec, dim: int, fill: float, dtype):
    if vec is None:
        return jnp.full((dim,), fill, dtype)
    vec = jnp.asarray(vec, dtype)
    return jnp.pad(vec, (0, dim - vec.shape[0]), constant_values=fill)


def stack_agent_specs_padded(
    problem: MultiAgentProblem,
) -> Tuple[Optional[OCPSpec], Optional[PadMeta]]:
    """Stack heterogeneous agents into one padded spec, or (None, None).

    Returns ``(stacked_spec, meta)`` when the mix is paddable (see module
    docstring).  Lane layout: state ``[nx_max physical | K indicator]``,
    controls ``[nu_max]``; lane ``i``'s indicator block is the one-hot of its
    type, carried in ``initial_state`` (zero dynamics keep it constant).
    """
    if not problem.blocks:
        problem.compute_offsets()
    specs = [b.agent.ocp.spec() for b in problem.blocks]
    if not specs or not paddable(specs):
        return None, None

    sigs = [_type_signature(s) for s in specs]
    type_list: List = []
    lane_types: List[int] = []
    for sig in sigs:
        if sig not in type_list:
            type_list.append(sig)
        lane_types.append(type_list.index(sig))
    K = len(type_list)
    if K == 1:
        return None, None  # homogeneous: use the unpadded fast path

    nx_max = max(s.state_dim for s in specs)
    nu_max = max(s.control_dim for s in specs)
    T = specs[0].horizon_steps
    dt = specs[0].dt
    mode = specs[0].derivative_mode
    dtype = specs[0].initial_state.dtype

    dyn, stage, term, eq_fn, ineq_fn, eq_max, ineq_max = _dispatch_functions(
        tuple(type_list), nx_max, nu_max
    )

    # --- per-lane padded leaves ---------------------------------------
    x0s, u0s = [], []
    for spec, tk in zip(specs, lane_types):
        onehot = jnp.zeros((K,), dtype).at[tk].set(1.0)
        x0s.append(jnp.concatenate([_pad_vec(spec.initial_state, nx_max, 0.0, dtype), onehot]))
        u0 = jnp.asarray(spec.initial_controls, dtype)
        u0s.append(jnp.pad(u0, ((0, 0), (0, nu_max - u0.shape[1]))))

    def stack_bounds(attr: str, dim: int, lo: bool, indicator_dims: int):
        """Stack a bounds leaf iff any lane has it; pad absent with +-BIG.

        Padded *control* dims get lb=ub=0 (exact pin); padded *state* and
        indicator dims get +-BIG (they are constants; keep AL machinery
        quiet about them).
        """
        vals = [getattr(s, attr) for s in specs]
        if all(v is None for v in vals):
            return None
        fill = -_BIG if lo else _BIG
        pad_fill = 0.0 if attr.startswith("input") else fill
        rows = []
        for spec, v in zip(specs, vals):
            true_dim = spec.control_dim if attr.startswith("input") else spec.state_dim
            base = _pad_vec(v, true_dim, fill, dtype) if v is None else jnp.asarray(v, dtype)
            row = jnp.pad(base, (0, dim - true_dim), constant_values=pad_fill)
            if indicator_dims:
                row = jnp.concatenate([row, jnp.full((indicator_dims,), fill, dtype)])
            rows.append(row)
        return jnp.stack(rows)

    # Reference clamps controls only when BOTH input bounds exist
    # (ilqr.hpp:213-214); preserve that by emitting both-or-neither.
    any_input_bounds = any(
        s.input_lower_bounds is not None and s.input_upper_bounds is not None
        for s in specs
    )

    derivs = make_derivatives(
        dyn,
        stage,
        term,
        eq_fn,
        ineq_fn,
        mode=mode,
        step_fx=_step_jacobians(dyn, float(dt), mode == "fd")[0],
        step_fu=_step_jacobians(dyn, float(dt), mode == "fd")[1],
    )

    stacked = OCPSpec(
        initial_state=jnp.stack(x0s),
        initial_controls=jnp.stack(u0s),
        state_lower_bounds=stack_bounds("state_lower_bounds", nx_max, True, K),
        state_upper_bounds=stack_bounds("state_upper_bounds", nx_max, False, K),
        input_lower_bounds=stack_bounds("input_lower_bounds", nu_max, True, 0)
        if any_input_bounds
        else None,
        input_upper_bounds=stack_bounds("input_upper_bounds", nu_max, False, 0)
        if any_input_bounds
        else None,
        dynamics=dyn,
        stage_cost=stage,
        terminal_cost=term,
        objective_function=_synthesized_objective(stage, term),
        equality_constraints=eq_fn,
        inequality_constraints=ineq_fn,
        derivs=derivs,
        state_dim=nx_max + K,
        control_dim=nu_max,
        horizon_steps=T,
        eq_dim=eq_max,
        ineq_dim=ineq_max,
        dt=float(dt),
        objective_is_default=True,
        derivative_mode=mode,
    )
    meta = PadMeta(
        state_dims=tuple(s.state_dim for s in specs),
        control_dims=tuple(s.control_dim for s in specs),
        n_types=K,
        nx_max=nx_max,
        nu_max=nu_max,
    )
    return stacked, meta


def scatter_padded_results(
    problem: MultiAgentProblem, meta: PadMeta, states, controls, costs
) -> None:
    """Slice lane i's padded result back to agent i's true dimensions."""
    states = np.asarray(states)
    controls = np.asarray(controls)
    costs = np.asarray(costs)   # one transfer, not one slice-dispatch per agent
    for i, block in enumerate(problem.blocks):
        nx, nu = meta.state_dims[i], meta.control_dims[i]
        block.agent.ocp.set_result(
            jnp.asarray(states[i, :, :nx]), jnp.asarray(controls[i, :, :nu]),
            float(costs[i]),
        )
