"""multi_agent_solver_tpu: a TPU-native multi-agent trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``markomiz/multi_agent_solver`` C++ reference: continuous-time nonlinear
optimal-control problems over a discretized horizon, solved by
augmented-Lagrangian iLQR, constrained gradient descent, and ADMM-QP-backed
SQP solvers (shooting + trapezoidal direct collocation), composed with
centralized and Nash best-response multi-agent coordination strategies --
batched with ``vmap`` and sharded over TPU device meshes.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache, on by default.  Remote ("tunneled") TPU
# backends pay a multi-second round-trip per compile, and a session touches
# dozens of small executables before the first solve; with the cache warm,
# example start-up drops from minutes to seconds.  Opt out with
# MAS_TPU_NO_COMPILE_CACHE=1; an explicit user cache dir is respected.
if not _os.environ.get("MAS_TPU_NO_COMPILE_CACHE"):
    # CPU-only sessions (tests, local dev) skip the cache: XLA:CPU AOT
    # reloads are machine-feature-sensitive and CPU compiles are cheap.
    if (
        _jax.config.jax_compilation_cache_dir is None
        and _jax.config.jax_platforms != "cpu"
        and _os.environ.get("JAX_PLATFORMS") != "cpu"
    ):
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/multi_agent_solver_tpu/xla"),
        )
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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
