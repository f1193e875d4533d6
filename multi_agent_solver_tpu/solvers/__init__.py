"""Solver family: iLQR, CGD, ADMM-QP-backed SQP solvers.

The analogue of the reference's ``std::variant``-based solver layer
(``solvers/solver.hpp:17-45``): ``make_solver(name)`` constructs by canonical
name, ``solve(solver, problem)`` / ``set_params(solver, params)`` mirror the
free-function visitors.
"""

from .base import (
    SolveResult,
    SolverBase,
    available_solver_names,
    canonical_solver_name,
    make_solver,
    make_solver_like,
    normalize_key,
    register_solver,
)
from .admm_qp import ADMMConfig, QPSolution, solve_box_qp
from .cgd import CGD, CGDConfig, solve_cgd
from .ilqr import ILQR, ILQRConfig, solve_ilqr
from .mppi import MPPI, MPPIConfig, solve_mppi
from .osqp_shooting import OSQP, OSQPShootingConfig, solve_osqp_shooting
from .osqp_collocation import OSQPCollocation, OSQPCollocationConfig, solve_osqp_collocation


def solve(solver: SolverBase, problem) -> SolveResult:
    """Free-function visitor (reference: solver.hpp:28-32)."""
    return solver.solve(problem)


def set_params(solver: SolverBase, params) -> None:
    """Free-function visitor (reference: solver.hpp:34-38)."""
    solver.set_params(params)


__all__ = [
    "SolveResult",
    "SolverBase",
    "available_solver_names",
    "canonical_solver_name",
    "make_solver",
    "make_solver_like",
    "normalize_key",
    "register_solver",
    "solve",
    "set_params",
    "ADMMConfig",
    "QPSolution",
    "solve_box_qp",
    "CGD",
    "CGDConfig",
    "solve_cgd",
    "ILQR",
    "ILQRConfig",
    "solve_ilqr",
    "MPPI",
    "MPPIConfig",
    "solve_mppi",
    "OSQP",
    "OSQPShootingConfig",
    "solve_osqp_shooting",
    "OSQPCollocation",
    "OSQPCollocationConfig",
    "solve_osqp_collocation",
]
