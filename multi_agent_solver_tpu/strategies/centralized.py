"""Centralized strategy: solve the joint OCP (structure-aware).

Analogue of the reference's ``strategies/centralized.hpp:10-39``: compute
offsets, build the global OCP, run the (pre-parameterized) solver on it, and
scatter block rows back into each agent's result storage.

**Structure-aware dispatch (beyond the reference).**  When the agents are
homogeneous and there is no inter-agent coupling, the joint OCP is exactly
block-diagonal: its optimum is the concatenation of the per-agent optima.
The reference still pays the dense joint solve -- O((N nx)^3) Riccati
algebra per stage (centralized.hpp:18-38 feeds the stacked problem to a
generic solver).  Here the same solve dispatches to the solver's *batched*
per-agent path (agents as vmap lanes, hitting the fused Pallas kernels),
which is O(N) in agents and reaches the identical optimum.  Opt out with
``structure_aware=False`` to force the literal joint solve.

Note the reference's bound-merge quirk (input bounds dropped unless every
agent has them, multi_agent_problem.hpp:76-92) cannot diverge under the
dispatch: agents where only some have bounds differ in spec structure, are
not homogeneous, and therefore take the joint path anyway.
"""

from __future__ import annotations

import jax

from ..multi_agent import MultiAgentProblem
from ..solution import Solution
from ..solvers.base import SolverBase
from .base import (
    agents_are_homogeneous,
    collect_solution,
    register_strategy,
    scatter_stacked_results,
    stack_agent_specs,
)


@register_strategy
class CentralizedStrategy:
    """Holds a solver whose params were set before construction
    (example_utils.hpp:100-101)."""

    name = "centralized"

    def __init__(self, solver: SolverBase, structure_aware: bool = True):
        self.solver = solver
        self.structure_aware = structure_aware
        self._jitted = None
        self._jitted_key = None

    def _solve_batched(self, specs):
        key = (type(self.solver), self.solver.config)
        if self._jitted is None or self._jitted_key != key:
            solver_cls, config = type(self.solver), self.solver.config
            self._jitted = jax.jit(
                lambda s: solver_cls._solve_batched_fn(s, config)
            )
            self._jitted_key = key
        return self._jitted(specs)

    def __call__(self, problem: MultiAgentProblem) -> Solution:
        problem.compute_offsets()
        if (
            self.structure_aware
            and problem.inter_agent_cost is None
            and len(problem.blocks) > 1
            and agents_are_homogeneous(problem)
        ):
            specs = stack_agent_specs(problem)
            results = self._solve_batched(specs)
            scatter_stacked_results(
                problem, results.states, results.controls, results.cost
            )
            return collect_solution(problem)

        global_ocp = problem.build_global_ocp()
        self.solver.solve(global_ocp)
        problem.scatter_global_result(global_ocp)
        return collect_solution(problem)
