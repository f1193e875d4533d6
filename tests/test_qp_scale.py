"""Scale criteria for the structured QP path (VERDICT round 1, item 3).

* dense and structured backends agree at T=80;
* collocation solves a T=1024 single-track problem in reasonable time
  (the dense backend would need a 6144^2 KKT factor per rho stage);
* a 16-agent joint (centralized) problem solves through the shooting SQP.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import pytest

from multi_agent_solver_tpu.solvers.osqp_collocation import (
    OSQPCollocationConfig,
    solve_osqp_collocation,
)
from multi_agent_solver_tpu.solvers.osqp_shooting import (
    OSQPShootingConfig,
    solve_osqp_shooting,
)

from .problems import lqr_ocp, single_track_lane_ocp


def test_backends_agree_single_track_T80():
    ocp = single_track_lane_ocp()
    for cls, solve in (
        (OSQPCollocationConfig, solve_osqp_collocation),
        (OSQPShootingConfig, solve_osqp_shooting),
    ):
        dense = solve(ocp.spec(), cls(backend="dense"))
        structured = solve(ocp.spec(), cls(backend="structured"))
        np.testing.assert_allclose(
            float(structured.cost), float(dense.cost), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(structured.controls), np.asarray(dense.controls),
            rtol=1e-3, atol=1e-4,
        )


def test_collocation_long_horizon_T1024():
    ocp = single_track_lane_ocp(horizon_steps=1024)
    config = OSQPCollocationConfig(max_iterations=6, tolerance=1e-4)
    t0 = time.time()
    result = solve_osqp_collocation(ocp.spec(), config)
    elapsed = time.time() - t0
    cost = float(result.cost)
    # Lane-keeping cost scales ~linearly in T; the T=80 solve lands ~176.
    assert np.isfinite(cost)
    assert cost < 4000.0, cost
    # Generous bound: catches an accidental fall-back to dense O(n^3).
    assert elapsed < 600.0, elapsed


def test_joint_16_agent_shooting():
    """16 stacked LQR agents (joint nx = nu = 64, nb = 128)."""
    from multi_agent_solver_tpu import Agent, MultiAgentProblem

    problem = MultiAgentProblem()
    for i in range(16):
        problem.add_agent(Agent(i, lqr_ocp()))
    joint = problem.build_global_ocp()
    config = OSQPShootingConfig(max_iterations=4, tolerance=1e-6)
    result = solve_osqp_shooting(joint.spec(), config)
    cost = float(result.cost)
    assert np.isfinite(cost)
    # 16 independent copies: the joint cost is 16x the single-agent cost
    # landed by the same solver budget.
    single = solve_osqp_shooting(lqr_ocp().spec(), config)
    np.testing.assert_allclose(cost, 16.0 * float(single.cost), rtol=1e-5)


def test_collocation_nonfinite_step_guard():
    """A diverging full-step SQP stays finite: the first non-finite QP step
    is rejected and the loop stops with the last finite iterate (the
    reference NaNs the whole trajectory, osqp_collocation.hpp:488-494)."""
    import jax.numpy as jnp

    from multi_agent_solver_tpu import OCP

    # sqrt(x) dynamics with a cost minimum at x = -5: the initial zero-control
    # rollout is finite, but the unguarded full delta step chases the minimum
    # straight through the x <= 0 singularity, after which every
    # defect/Jacobian evaluation is NaN.
    ocp = OCP(
        state_dim=1, control_dim=1, horizon_steps=10, dt=0.5,
        initial_state=jnp.array([0.04]),
        dynamics=lambda x, u: jnp.sqrt(x) * u,
        stage_cost=lambda x, u, t: (x[0] + 5.0) ** 2 + 1e-4 * u[0] ** 2,
    )
    ocp.initialize_problem()
    for backend in ("structured", "dense"):
        result = solve_osqp_collocation(
            ocp.spec(), OSQPCollocationConfig(max_iterations=12, backend=backend)
        )
        assert np.all(np.isfinite(np.asarray(result.states))), backend
        assert np.all(np.isfinite(np.asarray(result.controls))), backend
