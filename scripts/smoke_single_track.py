"""Smoke test: single-track lane following with iLQR; reference cost = 24.4039."""

import time
import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from multi_agent_solver_tpu import OCP, make_solver
from multi_agent_solver_tpu.models import (
    single_track_model,
    single_track_state_jacobian,
    single_track_control_jacobian,
)


def create_single_track_lane_following_ocp():
    """Mirrors examples/single_track_ocp.cpp:14-116."""
    w_lane, w_speed, w_delta, w_acc = 10.0, 1.0, 0.1, 0.1
    v_des = 1.0

    def stage_cost(x, u, t):
        return (
            w_lane * x[1] ** 2
            + w_speed * (x[3] - v_des) ** 2
            + w_delta * u[0] ** 2
            + w_acc * u[1] ** 2
        )

    ocp = OCP(
        state_dim=4,
        control_dim=2,
        horizon_steps=80,
        dt=0.1,
        initial_state=jnp.array([0.0, 1.0, 0.0, 0.0]),
        dynamics=single_track_model,
        stage_cost=stage_cost,
        terminal_cost=lambda x: jnp.asarray(0.0),
        dynamics_state_jacobian=single_track_state_jacobian,
        dynamics_control_jacobian=single_track_control_jacobian,
        input_lower_bounds=jnp.array([-0.7, -1.0]),
        input_upper_bounds=jnp.array([0.7, 1.0]),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


if __name__ == "__main__":
    params = {"max_iterations": 10, "tolerance": 1e-5, "max_ms": 100}

    for name in ["ilqr", "cgd"]:
        ocp = create_single_track_lane_following_ocp()
        solver = make_solver(name, params)
        t0 = time.perf_counter()
        result = solver.solve(ocp)
        jax.block_until_ready(result.states)
        compile_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        result = solver.solve(ocp)
        jax.block_until_ready(result.states)
        run_time = time.perf_counter() - t0

        print(
            f"solver={name} cost={ocp.best_cost:.6f} iters={int(result.iterations)} "
            f"converged={bool(result.converged)} compile_s={compile_time:.2f} "
            f"run_ms={run_time*1e3:.3f}"
        )
