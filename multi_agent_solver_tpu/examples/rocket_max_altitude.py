"""Rocket maximum-altitude example with fuel-mass state bounds.

Mirrors ``examples/rocket_max_altitude.cpp:31-197``: stage cost
``0.5 * 5e-3 * thrust^2``, terminal ``-15 h + 0.5 * 2 * v^2``, thrust box
[0, 20], mass state bounds [0, m0] (enforced by the QP solvers only, exactly
like the reference -- iLQR/CGD ignore state bounds), constant half-thrust
initial guess, T=50, dt=0.1, exhaust velocity 50,
params {max_iterations: 25, tolerance: 1e-6, max_ms: 200}.
"""

from __future__ import annotations

import sys

from ._common import Timer, print_available, result_line, run_main

import jax.numpy as jnp

from ..ocp import OCP
from ..models import (
    RocketParameters,
    make_rocket_dynamics,
    make_rocket_state_jacobian,
    make_rocket_control_jacobian,
)
from ..solvers import canonical_solver_name, make_solver
from ..utils.cli import parse_rocket_options
from ..utils.csv_io import print_control_trajectory, print_state_trajectory

MAX_THRUST = 20.0
W_THRUST = 5e-3
W_TERMINAL_ALTITUDE = 15.0
W_TERMINAL_VELOCITY = 2.0


def create_max_altitude_rocket_ocp() -> OCP:
    params = RocketParameters(initial_mass=1.0, gravity=9.81, exhaust_velocity=50.0)

    def stage_cost(x, u, t):
        return 0.5 * W_THRUST * u[0] ** 2

    def terminal_cost(x):
        return -W_TERMINAL_ALTITUDE * x[0] + 0.5 * W_TERMINAL_VELOCITY * x[1] ** 2

    # Analytic cost derivatives (rocket_max_altitude.cpp:66-112).
    def cost_control_gradient(x, u, t):
        return jnp.array([W_THRUST * u[0]])

    def cost_control_hessian(x, u, t):
        return jnp.array([[W_THRUST]])

    def cost_state_gradient(x, u, t):
        return jnp.zeros(3)

    def cost_state_hessian(x, u, t):
        return jnp.zeros((3, 3))

    def terminal_cost_gradient(x):
        return jnp.array([-W_TERMINAL_ALTITUDE, W_TERMINAL_VELOCITY * x[1], 0.0])

    def terminal_cost_hessian(x):
        return jnp.zeros((3, 3)).at[1, 1].set(W_TERMINAL_VELOCITY)

    big = jnp.finfo(jnp.result_type(float)).max
    # The reference builds its lower state bounds with
    # std::numeric_limits<double>::min() (rocket_max_altitude.cpp:122) -- the
    # smallest POSITIVE double, i.e. effectively zero -- so its QP solvers
    # enforce h >= 0 and v >= 0 as well as the mass bound.  Mirror that.
    ocp = OCP(
        state_dim=3,
        control_dim=1,
        horizon_steps=50,
        dt=0.1,
        initial_state=jnp.array([0.0, 0.0, params.initial_mass]),
        dynamics=make_rocket_dynamics(params),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        cost_control_gradient=cost_control_gradient,
        cost_control_hessian=cost_control_hessian,
        cost_state_gradient=cost_state_gradient,
        cost_state_hessian=cost_state_hessian,
        terminal_cost_gradient=terminal_cost_gradient,
        terminal_cost_hessian=terminal_cost_hessian,
        dynamics_state_jacobian=make_rocket_state_jacobian(params),
        dynamics_control_jacobian=make_rocket_control_jacobian(params),
        input_lower_bounds=jnp.array([0.0]),
        input_upper_bounds=jnp.array([MAX_THRUST]),
        state_lower_bounds=jnp.array([0.0, 0.0, 0.0]),
        state_upper_bounds=jnp.array([big, big, params.initial_mass]),
        initial_controls=jnp.full((50, 1), MAX_THRUST / 2.0),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def main(argv=None) -> int:
    options = parse_rocket_options(sys.argv[1:] if argv is None else argv)
    if options.show_help:
        print("Usage: rocket_max_altitude [--solver NAME] [--dump]\n")
        print_available()
        return 0

    problem = create_max_altitude_rocket_ocp()
    params = {"max_iterations": 25, "tolerance": 1e-6, "max_ms": 200}
    # The reference's QP-family SQP is defective on this problem (verified
    # against the exact-QP mirror, docs/PARITY.md): its shooting QP's optimum
    # is u = 0 (never lift off) and full-step collocation diverges through
    # the thrust/max(m, 1e-6) rollout singularity.  Default to the repaired
    # modes; pass --sqp_exact=0 / --colloc_init=rollout for the raw
    # reference behavior.
    name = canonical_solver_name(options.solver)
    if name == "osqp":
        params["sqp_exact"] = 1.0
    elif name == "osqp_collocation":
        params["colloc_init"] = "hold"
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
    print_state_trajectory(None, problem.best_states, problem.dt, "rocket")
    print_control_trajectory(None, problem.best_controls, problem.dt, "rocket")
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
