"""multi_agent_solver_tpu: a TPU-native multi-agent trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``markomiz/multi_agent_solver`` C++ reference: continuous-time nonlinear
optimal-control problems over a discretized horizon, solved by
augmented-Lagrangian iLQR, constrained gradient descent, and ADMM-QP-backed
SQP solvers (shooting + trapezoidal direct collocation), composed with
centralized and Nash best-response multi-agent coordination strategies --
batched with ``vmap`` and sharded over TPU device meshes.
"""

from .ocp import OCP, OCPSpec, compute_trajectory_cost
from .integrators import integrate_euler, integrate_horizon, integrate_rk4
from .types import SolverParams
from .agent import Agent
from .multi_agent import AgentBlockInfo, MultiAgentProblem
from .solution import Solution
from .solvers import (
    CGD,
    ILQR,
    SolveResult,
    available_solver_names,
    canonical_solver_name,
    make_solver,
    set_params,
    solve,
)
from .strategies import (
    CentralizedStrategy,
    LineSearchNashStrategy,
    SequentialNashStrategy,
    TrustRegionNashStrategy,
    canonical_strategy_name,
    make_strategy,
)
from .strategies import solve as solve_multi_agent

__version__ = "0.1.0"

__all__ = [
    "OCP",
    "OCPSpec",
    "compute_trajectory_cost",
    "integrate_euler",
    "integrate_horizon",
    "integrate_rk4",
    "SolverParams",
    "Agent",
    "AgentBlockInfo",
    "MultiAgentProblem",
    "Solution",
    "CGD",
    "ILQR",
    "SolveResult",
    "available_solver_names",
    "canonical_solver_name",
    "make_solver",
    "set_params",
    "solve",
    "CentralizedStrategy",
    "LineSearchNashStrategy",
    "SequentialNashStrategy",
    "TrustRegionNashStrategy",
    "canonical_strategy_name",
    "make_strategy",
    "solve_multi_agent",
]
