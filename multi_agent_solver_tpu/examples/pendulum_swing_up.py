"""Pendulum swing-up with energy-shaping cost.

Mirrors ``examples/pendulum_swing_up.cpp:29-152``: time-varying stage weights
blending an energy error early against upright-shaping late (quadratic
schedule s^2), torque box +-5, sinusoidal initial-guess controls to break
symmetry, x0 = (pi - 0.05, 0), T=60, dt=0.05,
params {max_iterations: 1000, tolerance: 1e-4, max_ms: 5000}.
"""

from __future__ import annotations

import sys

from ._common import Timer, print_available, result_line, run_main

import jax.numpy as jnp

from ..ocp import OCP
from ..models import pendulum_dynamics
from ..models.pendulum import B as DAMPING, G, L, M
from ..solvers import canonical_solver_name, make_solver
from ..utils.cli import parse_solver_options
from ..utils.csv_io import print_control_trajectory, print_state_trajectory

TORQUE_MAX = 5.0
HORIZON = 60
DT = 0.05

W_ENERGY = 2.0
W_U = 0.05
W_SHAPE = 2.0
W_OMEGA = 0.05
WT_POS = 500.0
WT_VEL = 100.0
MGL = M * G * L


def create_pendulum_swingup_ocp() -> OCP:
    horizon_d = float(HORIZON)

    def stage_cost(x, u, k):
        theta, omega, torque = x[0], x[1], u[0]
        # Time-varying weights: energy matters early, shaping late
        # (pendulum_swing_up.cpp:66-74).
        s = k.astype(jnp.result_type(float)) / (horizon_d - 1.0)
        late = s * s
        early = 1.0 - late
        w_energy_k = W_ENERGY * (0.2 + 0.8 * early)
        w_shape_k = W_SHAPE * (0.2 + 0.8 * late)
        w_omega_k = W_OMEGA * (0.2 + 0.8 * late)

        T_kin = 0.5 * M * L * L * omega**2
        V_pot = MGL * jnp.cos(theta)
        energy_error = (T_kin + V_pot - MGL) / MGL
        upright_error = 1.0 - jnp.cos(theta)

        return (
            w_energy_k * energy_error**2
            + w_shape_k * upright_error
            + w_omega_k * omega**2
            + W_U * torque**2
        )

    def terminal_cost(x):
        return WT_POS * (1.0 - jnp.cos(x[0])) + WT_VEL * x[1] ** 2

    # Sinusoidal initial guess (pendulum_swing_up.cpp:110-115).
    ts = jnp.arange(HORIZON) * DT
    initial_controls = (0.2 * TORQUE_MAX * jnp.sin(2.0 * jnp.pi * ts))[:, None]

    ocp = OCP(
        state_dim=2,
        control_dim=1,
        horizon_steps=HORIZON,
        dt=DT,
        initial_state=jnp.array([jnp.pi - 0.05, 0.0]),
        dynamics=pendulum_dynamics,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        input_lower_bounds=jnp.array([-TORQUE_MAX]),
        input_upper_bounds=jnp.array([TORQUE_MAX]),
        initial_controls=initial_controls,
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def main(argv=None) -> int:
    options = parse_solver_options(sys.argv[1:] if argv is None else argv)
    if options.show_help:
        print("Usage: pendulum_swing_up [--solver NAME]\n")
        print_available()
        return 0

    problem = create_pendulum_swingup_ocp()
    params = {"max_iterations": 1000, "tolerance": 1e-4, "max_ms": 5000}
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
    print_state_trajectory(None, problem.best_states, problem.dt, "pendulum")
    print_control_trajectory(None, problem.best_controls, problem.dt, "pendulum")
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
