"""Nash best-response coordination strategies, TPU-native.

Analogue of the reference's ``strategies/nash.hpp``.  The reference's only
concurrency is OpenMP ``parallel for`` over agents (nash.hpp:45,59,66,134,200);
here a Jacobi sweep is ONE vmapped solver call over stacked agent lanes, and
the entire outer loop (sweeps + globalization) is a single jitted program --
sweeps, line-search blending, trust-region radius updates and total-cost
reductions all stay on-device.  On a device mesh the agent axis shards
naturally (see multi_agent_solver_tpu.parallel).

Semantics preserved from the reference:

* ``sequential``  -- ``max_outer`` unconditional Jacobi sweeps (solve all
  agents from their warm starts, then warm-start all from their new bests;
  nash.hpp:53-90).  Despite the name it is parallel Jacobi, not Gauss-Seidel.
* ``linesearch``  -- after a sweep that regresses the total cost, backtrack a
  *global* alpha in {0.5, 0.25, ... > 1e-3} blending
  ``u = old + alpha (candidate - old)`` for every agent simultaneously,
  accept the first improving alpha else revert all agents (nash.hpp:92-180).
  All candidate alphas are evaluated in one batched rollout (equivalent to
  the reference's decreasing first-accept order).
* ``trustregion`` -- per-agent radius r (init 1.0): scale each candidate step
  back to ``r`` when its norm exceeds it, accept improvements (r *= 1.5)
  else revert (r *= 0.5) (nash.hpp:182-248).

Agents must be homogeneous (same problem functions/dims) for the stacked
path; heterogeneous problems fall back to an equivalent host loop.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..multi_agent import MultiAgentProblem
from ..ocp import OCPSpec
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


def _vmapped_solve(solver_cls, config):
    """Per-sweep batched solve; uses the solver's fused batched kernel path
    when it has one (ILQR's Pallas Riccati/forward kernels)."""

    def batched(specs: OCPSpec):
        return solver_cls._solve_batched_fn(specs, config)

    return batched


def _batched_objective(specs: OCPSpec):
    """Per-agent true objective of rolled-out controls: [N] costs."""

    def one(spec, controls):
        xs = spec.rollout(controls)
        return spec.cost(xs, controls), xs

    def batched(controls):
        costs, xs = jax.vmap(one)(specs, controls)
        return costs, xs

    return batched


class _NashBase:
    name = "nash"

    def __init__(self, max_outer: int, solver_proto: SolverBase, params: SolverParams):
        self.max_outer = int(max_outer)
        self.solver_proto = solver_proto
        self.params = dict(params)
        self._config = type(solver_proto).config_cls.from_params(self.params)
        self._jitted = None

    # -- stacked fast path ----------------------------------------------
    def _run_stacked(self, specs: OCPSpec):
        raise NotImplementedError

    # -- host fallback (heterogeneous agents) ---------------------------
    def _run_host(self, problem: MultiAgentProblem) -> None:
        raise NotImplementedError

    def __call__(self, problem: MultiAgentProblem) -> Solution:
        if not problem.blocks:
            problem.compute_offsets()
        if agents_are_homogeneous(problem):
            specs = stack_agent_specs(problem)
            if self._jitted is None:
                self._jitted = jax.jit(self._run_stacked)
            states, controls, costs = self._jitted(specs)
            scatter_stacked_results(problem, states, controls, costs)
        else:
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
        batched_solve = _vmapped_solve(type(self.solver_proto), self._config)

        objective = _batched_objective(specs)

        def sweep(_, carry):
            warm, _, _ = carry
            results = batched_solve(specs.replace(initial_controls=warm))
            return (results.controls, results.states, results.cost)

        init_costs, init_xs = objective(specs.initial_controls)
        init = (specs.initial_controls, init_xs, init_costs)
        controls, states, costs = jax.lax.fori_loop(0, self.max_outer, sweep, init)
        return states, controls, costs

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
        batched_solve = _vmapped_solve(type(self.solver_proto), self._config)
        objective = _batched_objective(specs)

        alphas = jnp.asarray([0.5**k for k in range(1, 10)],
                             specs.initial_state.dtype)  # 0.5 .. ~0.002 > 1e-3

        def outer(_, carry):
            best_u, best_x, best_costs, base_cost = carry

            results = batched_solve(specs.replace(initial_controls=best_u))
            new_cost = jnp.sum(results.cost)

            def accept_sweep(_):
                return results.controls, results.states, results.cost, new_cost

            def backtrack(_):
                cand = results.controls

                def trial(alpha):
                    u = best_u + alpha * (cand - best_u)
                    costs, xs = objective(u)
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

        init_costs, init_xs = objective(specs.initial_controls)
        init = (specs.initial_controls, init_xs, init_costs, jnp.sum(init_costs))
        best_u, best_x, best_costs, _ = jax.lax.fori_loop(0, self.max_outer, outer, init)
        return best_x, best_u, best_costs

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
                    xs = spec.rollout(u)
                    c = float(spec.cost(xs, u))
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
        batched_solve = _vmapped_solve(type(self.solver_proto), self._config)
        objective = _batched_objective(specs)

        def outer(_, carry):
            best_u, best_x, best_costs, radii = carry

            results = batched_solve(specs.replace(initial_controls=best_u))
            delta = results.controls - best_u
            norms = jnp.sqrt(jnp.sum(delta**2, axis=(1, 2)))

            over = norms > radii
            scale = jnp.where(over, radii / jnp.maximum(norms, 1e-30), 1.0)
            cand_u = best_u + scale[:, None, None] * delta
            cand_costs, cand_x = objective(cand_u)
            # When the step was not scaled back, keep the solver's own
            # trajectory/cost (matches nash.hpp:211-222).
            cand_u = jnp.where(over[:, None, None], cand_u, results.controls)
            cand_x = jnp.where(over[:, None, None], cand_x, results.states)
            cand_costs = jnp.where(over, cand_costs, results.cost)

            accept = cand_costs < best_costs
            best_u = jnp.where(accept[:, None, None], cand_u, best_u)
            best_x = jnp.where(accept[:, None, None], cand_x, best_x)
            best_costs = jnp.where(accept, cand_costs, best_costs)
            radii = jnp.where(accept, radii * 1.5, radii * 0.5)
            return best_u, best_x, best_costs, radii

        init_costs, init_xs = objective(specs.initial_controls)
        radii = jnp.ones((specs.initial_controls.shape[0],), specs.initial_state.dtype)
        init = (specs.initial_controls, init_xs, init_costs, radii)
        best_u, best_x, best_costs, _ = jax.lax.fori_loop(0, self.max_outer, outer, init)
        return best_x, best_u, best_costs

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
                    cand_x = spec.rollout(cand_u)
                    cand_c = float(spec.cost(cand_x, cand_u))
                if cand_c < old_c:
                    ocp.set_result(cand_x, cand_u, cand_c)
                    radii[i] *= 1.5
                else:
                    ocp.set_result(old_x, old_u, old_c)
                    radii[i] *= 0.5
                block.agent.update_initial_with_best()
