"""Centralized strategy: solve the block-diagonal joint OCP once.

Analogue of the reference's ``strategies/centralized.hpp:10-39``: compute
offsets, build the global OCP, run the (pre-parameterized) solver on it, and
scatter block rows back into each agent's result storage.
"""

from __future__ import annotations

from ..multi_agent import MultiAgentProblem
from ..solution import Solution
from ..solvers.base import SolverBase
from .base import collect_solution, register_strategy


@register_strategy
class CentralizedStrategy:
    """Holds a solver whose params were set before construction
    (example_utils.hpp:100-101)."""

    name = "centralized"

    def __init__(self, solver: SolverBase):
        self.solver = solver

    def __call__(self, problem: MultiAgentProblem) -> Solution:
        problem.compute_offsets()
        global_ocp = problem.build_global_ocp()
        self.solver.solve(global_ocp)
        problem.scatter_global_result(global_ocp)
        return collect_solution(problem)
