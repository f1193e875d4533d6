"""Strategy infrastructure: stacking homogeneous agents for vmapped sweeps.

The reference parallelizes Nash best-response sweeps with OpenMP threads over
agents (nash.hpp:45,59,66,134,200).  The TPU-native equivalent stacks the
agents' problem *leaves* (initial states, warm starts, bounds) into batched
arrays and runs ONE vmapped solver call -- every agent occupies a batch lane
of the same compiled executable.  This requires the agents to be
*homogeneous*: identical problem functions and dimensions (the common case --
e.g. N cars sharing a model on a track, multi_agent_single_track.cpp:31-75).

Heterogeneous agents fall back to a per-agent host loop (still correct, one
compile per distinct problem structure), or to the centralized strategy which
supports arbitrary per-agent dims via block stacking.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple, Type

import jax
import jax.numpy as jnp

from ..multi_agent import MultiAgentProblem
from ..ocp import OCPSpec
from ..solution import Solution
from ..solvers.base import SolverBase
from ..types import SolverParams


def agents_are_homogeneous(problem: MultiAgentProblem) -> bool:
    """True when all agents share problem functions and dimensions, so their
    specs differ only in pytree leaves and can be stacked for vmap."""
    if not problem.blocks:
        problem.compute_offsets()
    specs = [b.agent.ocp.spec() for b in problem.blocks]
    if not specs:
        return False
    first = specs[0]
    static0 = jax.tree_util.tree_structure(first)
    for spec in specs[1:]:
        if jax.tree_util.tree_structure(spec) != static0:
            return False
    return True


def stack_agent_specs(problem: MultiAgentProblem) -> OCPSpec:
    """Stack per-agent spec leaves along a new leading axis: spec[i] = agent i."""
    specs = [b.agent.ocp.spec() for b in problem.blocks]
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *specs)


def scatter_stacked_results(problem: MultiAgentProblem, states, controls, costs) -> None:
    """Write lane i of the stacked result back into agent i's OCP.

    Fetches each stacked array to the host ONCE: indexing a device array
    per agent dispatches a dynamic-slice (a device round-trip each, ~3 ms
    over a remote tunnel), which made the host API O(N) in round-trips --
    40 s of scatter for a 1024-agent sweep whose device compute is <1 s.
    """
    import numpy as np

    states = np.asarray(states)
    controls = np.asarray(controls)
    costs = np.asarray(costs)
    for i, block in enumerate(problem.blocks):
        block.agent.ocp.set_result(states[i], controls[i], float(costs[i]))


def collect_solution(problem: MultiAgentProblem) -> Solution:
    """Gather per-agent best trajectories (reference: nash.hpp:23-37).

    ``total_cost`` accumulates as a host float: per-agent device-scalar
    adds are one round-trip each on remote backends (see
    scatter_stacked_results).
    """
    sol = Solution()
    total = 0.0
    for block in problem.blocks:
        ocp = block.agent.ocp
        sol.states.append(ocp.best_states)
        sol.controls.append(ocp.best_controls)
        sol.costs.append(ocp.best_cost)
        total += float(ocp.best_cost)
    sol.total_cost = total
    return sol


# ---------------------------------------------------------------------------
# Registry / factory (example_utils.hpp:51-110)
# ---------------------------------------------------------------------------

_STRATEGIES: Dict[str, type] = {}


def register_strategy(cls):
    _STRATEGIES[cls.name] = cls
    return cls


_STRATEGY_ALIASES = {
    # example_utils.hpp:51-64 (incl. British spelling)
    "centralized": "centralized",
    "centralised": "centralized",
    "sequential": "sequential",
    "sequentialnash": "sequential",
    "linesearch": "linesearch",
    "linesearchnash": "linesearch",
    "trustregion": "trustregion",
    "trustregionnash": "trustregion",
}


def canonical_strategy_name(name: str) -> str:
    key = re.sub(r"[^a-z0-9]", "", name.lower())
    if key not in _STRATEGY_ALIASES:
        raise ValueError(f"Unknown strategy '{name}'.")
    return _STRATEGY_ALIASES[key]


def available_strategy_names():
    return sorted(_STRATEGIES.keys())


def make_strategy(name: str, solver: SolverBase, params: SolverParams, max_outer: int):
    """Factory mirroring examples::make_strategy (example_utils.hpp:96-110)."""
    canonical = canonical_strategy_name(name)
    cls = _STRATEGIES[canonical]
    if canonical == "centralized":
        solver.set_params(params)   # params set before construction
        return cls(solver)
    return cls(max_outer, solver, params)


def solve(strategy, problem: MultiAgentProblem) -> Solution:
    """Free-function visitor (reference: strategy.hpp:15-19)."""
    return strategy(problem)
