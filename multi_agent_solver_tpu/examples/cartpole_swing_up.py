"""Cart-pole swing-up example (beyond the reference's five examples).

Underactuated 4-state swing-up (models/cartpole.py): start hanging down,
drive the pole upright while keeping the cart near the origin.  This
problem defeats pure local solvers — iLQR stalls at cost ~1330 even with 16
multistarts — so the example defaults to the framework's canonical solver
composition: a derivative-free **MPPI** global phase finds the swing-up
basin, then the requested local solver polishes from its warm start
(``OCP.update_initial_with_best``, the reference's MPC warm-start pathway,
ocp.hpp:95-100).  ``--mppi_seed=0`` disables the seeding phase,
``--solver mppi`` runs sampling only.

CSV sections ``cartpole_states`` / ``cartpole_controls`` follow the
reference stdout protocol (example_utils.hpp:123-167), so
``scripts/plot_example.py`` works unchanged.
"""

from __future__ import annotations

import sys

from ._common import Timer, print_available, result_line, run_main

import jax.numpy as jnp

from ..ocp import OCP
from ..models import (
    cartpole_dynamics,
    cartpole_swing_up_stage_cost,
    cartpole_swing_up_terminal_cost,
)
from ..solvers import canonical_solver_name, make_solver
from ..utils.cli import parse_solver_options
from ..utils.csv_io import print_control_trajectory, print_state_trajectory

FORCE_MAX = 12.0
HORIZON = 60
DT = 0.05

MPPI_SEED_PARAMS = {
    "max_iterations": 150, "tolerance": 0.0, "samples": 256,
    "sigma": 2.0, "temperature": 1.0, "max_ms": 0.0,
}


def create_cartpole_swingup_ocp() -> OCP:
    # Symmetry-breaking sinusoid seed, like the reference's pendulum
    # swing-up (pendulum_swing_up.cpp:110-115).
    ts = jnp.arange(HORIZON, dtype=jnp.result_type(float))
    initial_controls = (2.0 * jnp.sin(2.0 * jnp.pi * ts / HORIZON))[:, None]

    ocp = OCP(
        state_dim=4,
        control_dim=1,
        horizon_steps=HORIZON,
        dt=DT,
        initial_state=jnp.array([0.0, 0.05, 0.0, 0.0]),
        dynamics=cartpole_dynamics,
        stage_cost=cartpole_swing_up_stage_cost,
        terminal_cost=cartpole_swing_up_terminal_cost,
        input_lower_bounds=jnp.array([-FORCE_MAX]),
        input_upper_bounds=jnp.array([FORCE_MAX]),
        initial_controls=initial_controls,
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def main(argv=None) -> int:
    options = parse_solver_options(sys.argv[1:] if argv is None else argv)
    if options.show_help:
        print("Usage: cartpole_swing_up [--solver NAME] [--mppi_seed 0|1]\n")
        print_available()
        return 0

    problem = create_cartpole_swingup_ocp()
    params = {"max_iterations": 300, "tolerance": 1e-7, "max_ms": 5000}
    params.update(options.extra_params)
    seed_first = bool(params.pop("mppi_seed", 1.0))
    solver_name = canonical_solver_name(options.solver)
    solver = make_solver(options.solver, params)

    with Timer() as timer:
        if seed_first and solver_name != "mppi":
            make_solver("mppi", MPPI_SEED_PARAMS).solve(problem)
            problem.update_initial_with_best()
        if options.multistart > 1:
            from ..parallel.multistart import multistart_solve_host

            multistart_solve_host(solver, problem, options.multistart)
        else:
            solver.solve(problem)

    theta_T = float(problem.best_states[-1, 1])
    print(result_line(
        solver=solver_name,
        cost=float(problem.best_cost),
        upright_error=float(1.0 + jnp.cos(theta_T)),
        time_ms=timer.elapsed_ms,
    ))
    print_state_trajectory(None, problem.best_states, problem.dt, "cartpole")
    print_control_trajectory(None, problem.best_controls, problem.dt, "cartpole")
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
