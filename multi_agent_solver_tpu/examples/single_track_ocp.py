"""Single-track lane-following example (the headline benchmark problem).

Mirrors ``examples/single_track_ocp.cpp:14-174``: kinematic bicycle, cost
``10 y^2 + (v - 1)^2 + 0.1 (delta^2 + a^2)``, zero terminal cost, input box
delta in [-0.7, 0.7], a in [-1, 1], T=80, dt=0.1, analytic cost and dynamics
derivatives, params {max_iterations: 10, tolerance: 1e-5, max_ms: 100}.
"""

from __future__ import annotations

import sys

from ._common import Timer, print_available, result_line, run_main  # noqa: F401 (sets up JAX)

import jax.numpy as jnp

from ..ocp import OCP
from ..models import (
    single_track_model,
    single_track_state_jacobian,
    single_track_control_jacobian,
)
from ..solvers import canonical_solver_name, make_solver
from ..utils.cli import parse_solver_options
from ..utils.csv_io import print_control_trajectory, print_state_trajectory

W_LANE, W_SPEED, W_DELTA, W_ACC = 10.0, 1.0, 0.1, 0.1
DESIRED_VELOCITY = 1.0


def create_single_track_lane_following_ocp() -> OCP:
    def stage_cost(x, u, t):
        lane_error = x[1]
        speed_error = x[3] - DESIRED_VELOCITY
        return (
            W_LANE * lane_error**2
            + W_SPEED * speed_error**2
            + W_DELTA * u[0] ** 2
            + W_ACC * u[1] ** 2
        )

    # Analytic cost derivatives (single_track_ocp.cpp:63-100).
    def cost_state_gradient(x, u, t):
        return jnp.zeros(4).at[1].set(2.0 * W_LANE * x[1]).at[3].set(
            2.0 * W_SPEED * (x[3] - DESIRED_VELOCITY)
        )

    def cost_control_gradient(x, u, t):
        return jnp.array([2.0 * W_DELTA * u[0], 2.0 * W_ACC * u[1]])

    def cost_state_hessian(x, u, t):
        return jnp.diag(jnp.array([0.0, 2.0 * W_LANE, 0.0, 2.0 * W_SPEED]))

    def cost_control_hessian(x, u, t):
        return jnp.diag(jnp.array([2.0 * W_DELTA, 2.0 * W_ACC]))

    ocp = OCP(
        state_dim=4,
        control_dim=2,
        horizon_steps=80,
        dt=0.1,
        initial_state=jnp.array([0.0, 1.0, 0.0, 0.0]),
        dynamics=single_track_model,
        stage_cost=stage_cost,
        terminal_cost=lambda x: jnp.asarray(0.0),
        cost_state_gradient=cost_state_gradient,
        cost_control_gradient=cost_control_gradient,
        cost_state_hessian=cost_state_hessian,
        cost_control_hessian=cost_control_hessian,
        dynamics_state_jacobian=single_track_state_jacobian,
        dynamics_control_jacobian=single_track_control_jacobian,
        input_lower_bounds=jnp.array([-0.7, -1.0]),
        input_upper_bounds=jnp.array([0.7, 1.0]),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def main(argv=None) -> int:
    options = parse_solver_options(sys.argv[1:] if argv is None else argv)
    if options.show_help:
        print("Usage: single_track_ocp [--solver NAME]\n")
        print_available()
        return 0

    problem = create_single_track_lane_following_ocp()
    params = {"max_iterations": 10, "tolerance": 1e-5, "max_ms": 100}
    params.update(options.extra_params)   # CLI passthrough (--fused=1 etc.)
    solver = make_solver(options.solver, params)

    with Timer() as timer:
        if options.multistart > 1:
            from ..parallel.multistart import multistart_solve_host

            multistart_solve_host(solver, problem, options.multistart)
        else:
            solver.solve(problem)

    print(result_line(
        solver=canonical_solver_name(options.solver),
        cost=float(problem.best_cost),
        time_ms=timer.elapsed_ms,
    ))
    print_state_trajectory(None, problem.best_states, problem.dt, "single_track")
    print_control_trajectory(None, problem.best_controls, problem.dt, "single_track")
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
