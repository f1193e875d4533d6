"""Nash best-response coordination strategies, TPU-native.

Analogue of the reference's ``strategies/nash.hpp``.  The reference's only
concurrency is OpenMP ``parallel for`` over agents (nash.hpp:45,59,66,134,200);
here a Jacobi sweep is ONE batched solver call over stacked agent lanes
(hitting the solver's fused Pallas kernels when it has them), and the entire
outer loop (sweeps + globalization) is a single jitted program.

Semantics preserved from the reference:

* ``sequential``  -- ``max_outer`` unconditional Jacobi sweeps (solve all
  agents from their warm starts, then warm-start all from their new bests;
  nash.hpp:53-90).  Despite the name it is parallel Jacobi, not Gauss-Seidel.
* ``linesearch``  -- after a sweep that regresses the total cost, backtrack a
  *global* alpha in {0.5, 0.25, ... > 1e-3} blending
  ``u = old + alpha (candidate - old)`` for every agent simultaneously,
  accept the first improving alpha else revert all agents (nash.hpp:92-180).
* ``trustregion`` -- per-agent radius r (init 1.0): scale each candidate step
  back to ``r`` when its norm exceeds it, accept improvements (r *= 1.5)
  else revert (r *= 0.5) (nash.hpp:182-248).

**Beyond the reference -- coupled games.**  When
``MultiAgentProblem.inter_agent_cost`` is set, each agent's stage cost gains
``sum_j inter_agent_cost(x_i, x_j_frozen, t)`` against the other agents'
current plans (delivered through the spec's ``context`` leaf and refreshed
every sweep), turning the Jacobi sweeps into true best-response dynamics.
The reference has no inter-agent coupling at all
(multi_agent_problem.hpp:76-92).

Heterogeneous agents (mixed problem functions/dims) run on the same stacked
path via padding + type-indicator states (see :mod:`.hetero`); only mixes
with differing horizon/dt/derivative-mode fall back to an equivalent host
loop (uncoupled only).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..multi_agent import MultiAgentProblem
from ..ocp import OCPSpec, rollout_and_cost, with_context_cost
from ..solution import Solution
from ..solvers.base import SolverBase, make_solver_like
from ..types import SolverParams
from .base import (
    agents_are_homogeneous,
    collect_solution,
    register_strategy,
    scatter_stacked_results,
    stack_agent_specs,
)
from .hetero import scatter_padded_results, stack_agent_specs_padded


@functools.lru_cache(maxsize=None)
def make_coupled_stage(base_stage, inter):
    """Stage cost + summed pairwise coupling against a per-step context.

    Memoized on (base_stage, inter) identity so every consumer (Nash
    strategies, the mesh-sharded coupled sweep in parallel/mesh.py) gets the
    SAME function object -- spec statics must be identity-shared or jitted
    solvers retrace per call site.
    """

    def coupled_stage(x, u, t, ctx):          # ctx [K_or_N-1, nx]
        # vmap over the neighbours keeps the trace size O(1) in agent
        # count (an unrolled pair loop makes compilation O(N) and
        # intractable past a few dozen agents); works on both per-problem
        # vectors and lane-shaped kernel values.
        pair_costs = jax.vmap(lambda cj: inter(x, cj, t))(ctx)
        return base_stage(x, u, t) + jnp.sum(pair_costs, axis=0)

    return coupled_stage


class _NashBase:
    name = "nash"

    def __init__(self, max_outer: int, solver_proto: SolverBase, params: SolverParams):
        self.max_outer = int(max_outer)
        self.solver_proto = solver_proto
        self.params = dict(params)
        self._config = type(solver_proto).config_cls.from_params(self.params)
        self._jitted = None
        self._jitted_key = None

    # -- solver hook ----------------------------------------------------
    def _batched_solve(self, specs: OCPSpec):
        return type(self.solver_proto)._solve_batched_fn(specs, self._config)

    # -- coupling machinery ---------------------------------------------
    def _prepare(self, problem: MultiAgentProblem, specs: OCPSpec):
        """Attach coupling statics for this agent count; returns run specs."""
        n = specs.initial_state.shape[0]
        inter = problem.inter_agent_cost
        self._coupled = inter is not None
        if not self._coupled:
            self._ctx_for = None
            return specs

        k_neighbors = problem.coupling_neighbors
        if k_neighbors is not None and k_neighbors >= n - 1:
            k_neighbors = None   # all-pairs is cheaper than a KNN of everyone

        if k_neighbors is None:
            others = np.stack(
                [[j for j in range(n) if j != i] for i in range(n)]
            )  # [N, N-1]
            others_idx = jnp.asarray(others)

            def ctx_for(states):  # [N, T+1, nx] -> [N, T, N-1, nx]
                ctx = states[others_idx]              # [N, N-1, T+1, nx]
                return jnp.swapaxes(ctx[:, :, :-1, :], 1, 2)
        else:
            K = int(k_neighbors)
            dims = jnp.asarray(problem.coupling_distance_dims)
            T = specs.horizon_steps

            def ctx_for(states):  # [N, T+1, nx] -> [N, T, K, nx]
                st = states[:, :T, :]                         # [N, T, nx]
                pos = st[:, :, dims]                          # [N, T, d]
                diff = pos[:, None] - pos[None, :]            # [N, N, T, d]
                d2 = jnp.sum(diff**2, axis=-1)                # [N, N, T]
                d2 = d2 + 1e30 * jnp.eye(st.shape[0])[:, :, None]  # no self
                # K nearest others per (agent, t).
                _, idx = jax.lax.top_k(-jnp.moveaxis(d2, 2, 1), K)  # [N, T, K]
                ts = jnp.arange(T)[None, :, None]
                return st[idx, ts]                            # [N, T, K, nx]

        self._ctx_for = ctx_for

        return with_context_cost(specs, make_coupled_stage(specs.stage_cost, inter))

    def _objective(self, specs: OCPSpec, controls, context):
        """Per-agent cost of rolled-out controls (context-aware): [N]."""
        def one(spec, u, parts):
            xs = spec.rollout(u)
            s = spec.replace(context=parts) if self._coupled else spec
            return s.cost(xs, u), xs

        if self._coupled:
            costs, xs = jax.vmap(one)(specs, controls, context)
        else:
            costs, xs = jax.vmap(lambda s, u: one(s, u, None))(specs, controls)
        return costs, xs

    def _initial_state_costs(self, specs: OCPSpec):
        xs0 = jax.vmap(lambda s: s.rollout(s.initial_controls))(specs)
        ctx0 = self._ctx_for(xs0) if self._coupled else None
        costs0, _ = self._objective(specs, specs.initial_controls, ctx0)
        return xs0, costs0

    def _sweep_specs(self, specs: OCPSpec, warm, states):
        s = specs.replace(initial_controls=warm)
        if self._coupled:
            s = s.replace(context=self._ctx_for(states))
        return s

    def _finalize(self, specs, states, controls):
        """Recompute final per-agent costs against the FINAL joint plans."""
        ctx = self._ctx_for(states) if self._coupled else None
        costs, _ = self._objective(specs, controls, ctx)
        return states, controls, costs

    # -- template method -------------------------------------------------
    def _run_stacked(self, specs: OCPSpec):
        raise NotImplementedError

    def _run_host(self, problem: MultiAgentProblem) -> None:
        raise NotImplementedError

    def __call__(self, problem: MultiAgentProblem) -> Solution:
        if not problem.blocks:
            problem.compute_offsets()
        meta = None
        if agents_are_homogeneous(problem):
            specs = stack_agent_specs(problem)
        else:
            # Mixed agent types: pad to uniform dims with type-indicator
            # states (strategies/hetero.py) so the batched sweep still runs
            # as one compiled program.
            specs, meta = stack_agent_specs_padded(problem)
        if specs is not None:
            specs = self._prepare(problem, specs)
            key = (
                specs.initial_state.shape[0],
                self._coupled,
                problem.coupling_neighbors,
                id(specs.dynamics),
            )
            if self._jitted is None or self._jitted_key != key:
                self._jitted = jax.jit(self._run_stacked)
                self._jitted_key = key
            states, controls, costs = self._jitted(specs)
            if meta is None:
                scatter_stacked_results(problem, states, controls, costs)
            else:
                scatter_padded_results(problem, meta, states, controls, costs)
        else:
            if problem.inter_agent_cost is not None:
                raise NotImplementedError(
                    "inter-agent coupling requires agents stackable by "
                    "padding (equal horizon/dt, AD mode, default objective)"
                )
            self._run_host(problem)
        return collect_solution(problem)

    def _make_host_solvers(self, problem: MultiAgentProblem) -> List[SolverBase]:
        solvers = []
        for _ in problem.blocks:
            s = make_solver_like(self.solver_proto)   # nash.hpp:17-21
            s.set_params(self.params)
            solvers.append(s)
        return solvers


@register_strategy
class SequentialNashStrategy(_NashBase):
    """max_outer unconditional Jacobi sweeps (nash.hpp:74-90, 252-269)."""

    name = "sequential"

    def _run_stacked(self, specs: OCPSpec):
        def sweep(_, carry):
            warm, states, _ = carry
            results = self._batched_solve(self._sweep_specs(specs, warm, states))
            return (results.controls, results.states, results.cost)

        xs0, costs0 = self._initial_state_costs(specs)
        init = (specs.initial_controls, xs0, costs0)
        controls, states, _ = jax.lax.fori_loop(0, self.max_outer, sweep, init)
        return self._finalize(specs, states, controls)

    def _run_host(self, problem: MultiAgentProblem) -> None:
        solvers = self._make_host_solvers(problem)
        for _ in range(self.max_outer):
            for solver, block in zip(solvers, problem.blocks):   # Jacobi: solve all
                solver.solve(block.agent.ocp)
            for block in problem.blocks:                          # then update all
                block.agent.update_initial_with_best()


@register_strategy
class LineSearchNashStrategy(_NashBase):
    """Jacobi sweeps with global-alpha backtracking (nash.hpp:92-180)."""

    name = "linesearch"

    def _run_stacked(self, specs: OCPSpec):
        alphas = jnp.asarray([0.5**k for k in range(1, 10)],
                             specs.initial_state.dtype)  # 0.5 .. ~0.002 > 1e-3

        def outer(_, carry):
            best_u, best_x, best_costs, base_cost = carry

            results = self._batched_solve(
                self._sweep_specs(specs, best_u, best_x)
            )
            new_cost = jnp.sum(results.cost)

            def accept_sweep(_):
                return results.controls, results.states, results.cost, new_cost

            def backtrack(_):
                cand = results.controls

                def trial(alpha):
                    u = best_u + alpha * (cand - best_u)
                    ctx = None
                    if self._coupled:
                        xs = jax.vmap(lambda s, uu: s.rollout(uu))(specs, u)
                        ctx = self._ctx_for(xs)
                    costs, xs = self._objective(specs, u, ctx)
                    return jnp.sum(costs), u, xs, costs

                totals, us, xss, costss = jax.vmap(trial)(alphas)
                ok = totals < base_cost
                idx = jnp.argmax(ok)
                found = jnp.any(ok)

                u_sel = jnp.where(found, us[idx], best_u)
                x_sel = jnp.where(found, xss[idx], best_x)
                costs_sel = jnp.where(found, costss[idx], best_costs)
                base_sel = jnp.where(found, totals[idx], base_cost)
                return u_sel, x_sel, costs_sel, base_sel

            return jax.lax.cond(new_cost < base_cost, accept_sweep, backtrack,
                                operand=None)

        xs0, costs0 = self._initial_state_costs(specs)
        init = (specs.initial_controls, xs0, costs0, jnp.sum(costs0))
        best_u, best_x, _, _ = jax.lax.fori_loop(0, self.max_outer, outer, init)
        return self._finalize(specs, best_x, best_u)

    def _run_host(self, problem: MultiAgentProblem) -> None:
        solvers = self._make_host_solvers(problem)
        blocks = problem.blocks
        base_cost = sum(float(b.agent.ocp.best_cost) for b in blocks)
        for _ in range(self.max_outer):
            old = [
                (b.agent.ocp.best_controls, b.agent.ocp.best_states, b.agent.ocp.best_cost)
                for b in blocks
            ]
            for solver, block in zip(solvers, blocks):
                solver.solve(block.agent.ocp)
            for block in blocks:
                block.agent.update_initial_with_best()
            new_cost = sum(float(b.agent.ocp.best_cost) for b in blocks)
            if new_cost < base_cost:
                base_cost = new_cost
                continue
            cand = [b.agent.ocp.best_controls for b in blocks]
            alpha, accepted = 0.5, False
            while alpha > 1e-3 and not accepted:
                total = 0.0
                trials = []
                for (old_u, _, _), cand_u, block in zip(old, cand, blocks):
                    spec = block.agent.ocp.spec()
                    u = old_u + alpha * (cand_u - old_u)
                    xs, c = rollout_and_cost(spec, u)
                    c = float(c)
                    trials.append((u, xs, c))
                    total += c
                if total < base_cost:
                    for (u, xs, c), block in zip(trials, blocks):
                        block.agent.ocp.set_result(xs, u, c)
                        block.agent.update_initial_with_best()
                    base_cost = total
                    accepted = True
                else:
                    alpha *= 0.5
            if not accepted:
                for (old_u, old_x, old_c), block in zip(old, blocks):
                    block.agent.ocp.set_result(old_x, old_u, old_c)
                    block.agent.update_initial_with_best()


@register_strategy
class TrustRegionNashStrategy(_NashBase):
    """Per-agent trust-region globalization (nash.hpp:182-248)."""

    name = "trustregion"

    def _run_stacked(self, specs: OCPSpec):
        def outer(_, carry):
            best_u, best_x, best_costs, radii = carry

            results = self._batched_solve(
                self._sweep_specs(specs, best_u, best_x)
            )
            delta = results.controls - best_u
            norms = jnp.sqrt(jnp.sum(delta**2, axis=(1, 2)))

            over = norms > radii
            scale = jnp.where(over, radii / jnp.maximum(norms, 1e-30), 1.0)
            cand_u = best_u + scale[:, None, None] * delta
            # Evaluate against the pre-sweep (frozen) plans of the others.
            ctx = self._ctx_for(best_x) if self._coupled else None
            cand_costs, cand_x = self._objective(specs, cand_u, ctx)
            # Unscaled steps keep the solver's own trajectory/cost
            # (nash.hpp:211-222).
            cand_u = jnp.where(over[:, None, None], cand_u, results.controls)
            cand_x = jnp.where(over[:, None, None], cand_x, results.states)
            cand_costs = jnp.where(over, cand_costs, results.cost)

            accept = cand_costs < best_costs
            best_u = jnp.where(accept[:, None, None], cand_u, best_u)
            best_x = jnp.where(accept[:, None, None], cand_x, best_x)
            best_costs = jnp.where(accept, cand_costs, best_costs)
            radii = jnp.where(accept, radii * 1.5, radii * 0.5)
            return best_u, best_x, best_costs, radii

        xs0, costs0 = self._initial_state_costs(specs)
        radii = jnp.ones((specs.initial_controls.shape[0],), specs.initial_state.dtype)
        init = (specs.initial_controls, xs0, costs0, radii)
        best_u, best_x, _, _ = jax.lax.fori_loop(0, self.max_outer, outer, init)
        return self._finalize(specs, best_x, best_u)

    def _run_host(self, problem: MultiAgentProblem) -> None:
        solvers = self._make_host_solvers(problem)
        radii = [1.0] * len(problem.blocks)
        for _ in range(self.max_outer):
            for i, (solver, block) in enumerate(zip(solvers, problem.blocks)):
                ocp = block.agent.ocp
                old_u, old_x, old_c = ocp.best_controls, ocp.best_states, ocp.best_cost
                solver.solve(ocp)
                cand_u, cand_x, cand_c = ocp.best_controls, ocp.best_states, ocp.best_cost
                delta = cand_u - old_u
                norm = float(jnp.linalg.norm(delta))
                if norm > radii[i]:
                    spec = ocp.spec()
                    cand_u = old_u + (radii[i] / norm) * delta
                    cand_x, cand_c = rollout_and_cost(spec, cand_u)
                    cand_c = float(cand_c)
                if cand_c < old_c:
                    ocp.set_result(cand_x, cand_u, cand_c)
                    radii[i] *= 1.5
                else:
                    ocp.set_result(old_x, old_u, old_c)
                    radii[i] *= 0.5
                block.agent.update_initial_with_best()
