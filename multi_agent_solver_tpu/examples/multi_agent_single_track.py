"""Multi-agent single-track example: N cars tracking a circular path.

Mirrors ``examples/multi_agent_single_track.cpp:31-152``: cars spread at
angles ``2 pi i / N`` on a circle of radius 20, starting tangentially at
v=4; cost ``(sqrt(x^2+y^2) - r)^2 + (v - 5)^2 + 1e-3 (delta^2 + a^2)``;
zero terminal cost; input box +-0.5; T=10, dt=0.5;
params {max_iterations: 100, tolerance: 1e-5, max_ms: 1000}.

All agents share the same problem functions and differ only in their initial
state, so the Nash strategies run as ONE vmapped program over agent lanes.
"""

from __future__ import annotations

import math
import sys

from ._common import Timer, print_available, result_line, run_main

import jax.numpy as jnp

from ..agent import Agent
from ..multi_agent import MultiAgentProblem
from ..ocp import OCP
from ..models import single_track_model
from ..solvers import canonical_solver_name, make_solver
from ..strategies import canonical_strategy_name, make_strategy, solve as solve_strategy
from ..utils.cli import parse_multi_agent_options
from ..utils.csv_io import print_control_trajectory, print_state_trajectory

TIME_STEPS = 10
DT = 0.5
TRACK_RADIUS = 20.0
TARGET_VELOCITY = 5.0
W_TRACK, W_SPEED, W_DELTA, W_ACC = 1.0, 1.0, 0.001, 0.001


def _stage_cost(x, u, t):
    distance_from_track = jnp.sqrt(x[0] ** 2 + x[1] ** 2) - TRACK_RADIUS
    speed_error = x[3] - TARGET_VELOCITY
    return (
        W_TRACK * distance_from_track**2
        + W_SPEED * speed_error**2
        + W_DELTA * u[0] ** 2
        + W_ACC * u[1] ** 2
    )


def _terminal_cost(x):
    return jnp.asarray(0.0)


def create_single_track_circular_ocp(initial_theta: float) -> OCP:
    x0 = TRACK_RADIUS * math.cos(initial_theta)
    y0 = TRACK_RADIUS * math.sin(initial_theta)
    ocp = OCP(
        state_dim=4,
        control_dim=2,
        horizon_steps=TIME_STEPS,
        dt=DT,
        # Tangential start with some speed (multi_agent_single_track.cpp:44-46).
        initial_state=jnp.array([x0, y0, 1.57 + initial_theta, 4.0]),
        dynamics=single_track_model,
        stage_cost=_stage_cost,
        terminal_cost=_terminal_cost,
        input_lower_bounds=jnp.full((2,), -0.5),
        input_upper_bounds=jnp.full((2,), 0.5),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def make_collision_cost(weight: float, radius: float = 3.0):
    """Soft inter-agent collision cost (extension beyond the reference:
    the reference's agents never interact, multi_agent_problem.hpp:76-92)."""

    def collision_cost(x_i, x_j, t):
        d2 = (x_i[0] - x_j[0]) ** 2 + (x_i[1] - x_j[1]) ** 2
        return weight * jnp.exp(-d2 / (radius**2))

    return collision_cost


def build_problem(n_agents: int, coupling: float = 0.0) -> MultiAgentProblem:
    problem = MultiAgentProblem()
    for i in range(n_agents):
        theta = 2.0 * math.pi * i / n_agents
        problem.add_agent(Agent(i, create_single_track_circular_ocp(theta)))
    if coupling > 0.0:
        problem.inter_agent_cost = make_collision_cost(coupling)
    return problem


def main(argv=None) -> int:
    options = parse_multi_agent_options(sys.argv[1:] if argv is None else argv)
    if options.show_help:
        print("Usage: multi_agent_single_track [--agents N] [--solver NAME] "
              "[--strategy NAME] [--max-outer N] [--coupling W]\n")
        print_available()
        return 0

    problem = build_problem(options.agents, coupling=options.coupling)
    # projected_ls repairs the reference CGD's line-search stall at the
    # input box on this problem (mirror-verified at 129.079/agent vs
    # iLQR's 1.876, tests/test_cgd_parity.py; docs/PARITY.md).  Only CGD
    # reads the flag; pass --projected_ls=0 for the raw reference behavior.
    params = {"max_iterations": 100, "tolerance": 1e-5, "max_ms": 1000,
              "projected_ls": 1}
    params.update(options.extra_params)   # CLI passthrough (--fused=1 etc.)
    solver = make_solver(options.solver)
    strategy = make_strategy(options.strategy, solver, params, options.max_outer)

    with Timer() as timer:
        solution = solve_strategy(strategy, problem)

    print(result_line(
        solver=canonical_solver_name(options.solver),
        strategy=canonical_strategy_name(options.strategy),
        agents=options.agents,
        cost=float(solution.total_cost),
        time_ms=timer.elapsed_ms,
    ))
    if not problem.blocks:
        problem.compute_offsets()
    for idx, block in enumerate(problem.blocks):
        if idx >= len(solution.states):
            break
        base = f"agent_{block.agent_id}"
        print_state_trajectory(None, solution.states[idx], block.agent.ocp.dt, base)
        print_control_trajectory(None, solution.controls[idx], block.agent.ocp.dt, base)
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
