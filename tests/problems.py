"""Shared test problem builders (the reference's example problems)."""

from __future__ import annotations

import jax.numpy as jnp

from multi_agent_solver_tpu import OCP
from multi_agent_solver_tpu.models import (
    make_linear_dynamics,
    quadratic_stage_cost,
    quadratic_terminal_cost,
    single_track_model,
    single_track_control_jacobian,
    single_track_state_jacobian,
)


def single_track_lane_ocp(**overrides) -> OCP:
    """Mirrors examples/single_track_ocp.cpp:14-116 (nx=4, nu=2, T=80, dt=0.1)."""
    w_lane, w_speed, w_delta, w_acc = 10.0, 1.0, 0.1, 0.1
    v_des = 1.0

    def stage_cost(x, u, t):
        return (
            w_lane * x[1] ** 2
            + w_speed * (x[3] - v_des) ** 2
            + w_delta * u[0] ** 2
            + w_acc * u[1] ** 2
        )

    kwargs = dict(
        state_dim=4,
        control_dim=2,
        horizon_steps=80,
        dt=0.1,
        initial_state=jnp.array([0.0, 1.0, 0.0, 0.0]),
        dynamics=single_track_model,
        stage_cost=stage_cost,
        dynamics_state_jacobian=single_track_state_jacobian,
        dynamics_control_jacobian=single_track_control_jacobian,
        input_lower_bounds=jnp.array([-0.7, -1.0]),
        input_upper_bounds=jnp.array([0.7, 1.0]),
    )
    kwargs.update(overrides)
    ocp = OCP(**kwargs)
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def head_on_fleet_problem(n: int = 8, coupling_neighbors=None):
    """N homogeneous cars in opposing lanes with a soft collision coupling.

    Even agents drive +x from the left, odd agents -x from the right, on
    slightly offset lanes, so the pairwise coupling is active for every
    agent.  Used by the coupled-Nash mesh tests.
    """
    from multi_agent_solver_tpu import Agent, MultiAgentProblem

    def stage_cost(x, u, t):
        return 1.0 * x[1] ** 2 + (x[3] - 2.0) ** 2 + 0.05 * (u[0] ** 2 + u[1] ** 2)

    def make(agent_id, x0):
        ocp = OCP(
            state_dim=4,
            control_dim=2,
            horizon_steps=20,
            dt=0.25,
            initial_state=jnp.asarray(x0, jnp.float64),
            dynamics=single_track_model,
            stage_cost=stage_cost,
            input_lower_bounds=jnp.array([-0.6, -2.0]),
            input_upper_bounds=jnp.array([0.6, 2.0]),
        )
        ocp.initialize_problem()
        return Agent(agent_id, ocp)

    problem = MultiAgentProblem()
    for i in range(n):
        lane = 0.3 * (i // 2)
        if i % 2 == 0:
            problem.add_agent(make(i, [-8.0, lane, 0.0, 2.0]))
        else:
            problem.add_agent(make(i, [8.0, lane + 0.15, jnp.pi, 2.0]))

    def collision_cost(x_i, x_j, t):
        d2 = (x_i[0] - x_j[0]) ** 2 + (x_i[1] - x_j[1]) ** 2
        return 30.0 * jnp.exp(-d2 / 4.0)

    problem.inter_agent_cost = collision_cost
    problem.coupling_neighbors = coupling_neighbors
    return problem


def lqr_ocp(n_x: int = 4, n_u: int = 4, dt: float = 0.1, T: int = 10) -> OCP:
    """Mirrors examples/multi_agent_lqr.cpp:21-80: A=B=I, Q=R=Qf=I, x0=[1,0,...]."""
    A = jnp.eye(n_x)
    B = jnp.eye(n_x, n_u)
    Q = jnp.eye(n_x)
    R = jnp.eye(n_u)
    x0 = jnp.zeros(n_x).at[0].set(1.0)

    ocp = OCP(
        state_dim=n_x,
        control_dim=n_u,
        horizon_steps=T,
        dt=dt,
        initial_state=x0,
        dynamics=make_linear_dynamics(A, B),
        stage_cost=quadratic_stage_cost(Q, R),
        terminal_cost=quadratic_terminal_cost(Q),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp
