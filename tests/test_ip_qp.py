"""Interior-point trajectory-QP backend vs the oracle and the ADMM backend."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from multi_agent_solver_tpu.solvers.admm_qp import ADMMConfig, INFTY
from multi_agent_solver_tpu.solvers.ip_qp import solve_traj_box_qp_ip
from multi_agent_solver_tpu.solvers.traj_qp import TrajQP, solve_traj_box_qp

from . import reference_mirror as mirror
from .test_traj_qp import random_traj_qp

TIGHT = ADMMConfig(eps_abs=1e-9, eps_rel=1e-9)


def test_ip_matches_oracle_on_equality_banded_qps():
    rng = np.random.default_rng(7)
    for trial in range(4):
        qp, (P, q, A, lb, ub) = random_traj_qp(rng, allow_ranged=False)
        w_star, _ = mirror.solve_qp_oracle(P, q, A, lb, ub)
        sol = solve_traj_box_qp_ip(qp, TIGHT)
        assert bool(sol.converged), trial
        np.testing.assert_allclose(
            np.asarray(sol.w).reshape(-1), w_star, rtol=1e-6, atol=1e-6
        )


def test_ip_unbounded_variables_and_pins():
    """+-inf rows fall back to pure equality QP; zero-width boxes pin."""
    rng = np.random.default_rng(11)
    qp, (P, q, A, lb, ub) = random_traj_qp(rng, allow_ranged=False,
                                           with_boxes=False)
    # Pin two variables to fixed values.
    z_lb = np.asarray(qp.z_lb).copy()
    z_ub = np.asarray(qp.z_ub).copy()
    z_lb[0, 0] = z_ub[0, 0] = 0.3
    z_lb[3, 2] = z_ub[3, 2] = -0.1
    qp = qp._replace(z_lb=jnp.asarray(z_lb), z_ub=jnp.asarray(z_ub))
    n = z_lb.size
    lb2 = np.concatenate([lb[: -n], z_lb.reshape(-1)])
    ub2 = np.concatenate([ub[: -n], z_ub.reshape(-1)])
    w_star, _ = mirror.solve_qp_oracle(P, q, A, lb2, ub2)
    sol = solve_traj_box_qp_ip(qp, TIGHT)
    assert bool(sol.converged)
    np.testing.assert_allclose(
        np.asarray(sol.w).reshape(-1), w_star, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(sol.w[0, 0]), 0.3, atol=1e-6)
    np.testing.assert_allclose(float(sol.w[3, 2]), -0.1, atol=1e-6)


def test_ip_agrees_with_admm_backend():
    rng = np.random.default_rng(23)
    qp, _ = random_traj_qp(rng, allow_ranged=False)
    admm = solve_traj_box_qp(qp, ADMMConfig(max_iterations=40000,
                                            eps_abs=1e-10, eps_rel=1e-10))
    ip = solve_traj_box_qp_ip(qp, TIGHT)
    np.testing.assert_allclose(
        np.asarray(ip.w), np.asarray(admm.w), rtol=1e-5, atol=1e-6
    )


def test_sqp_solvers_with_ip_backend_match_admm():
    """Both SQP transcriptions reach the same answers through the IP QP."""
    from multi_agent_solver_tpu.solvers.osqp_collocation import (
        OSQPCollocationConfig, solve_osqp_collocation,
    )
    from multi_agent_solver_tpu.solvers.osqp_shooting import (
        OSQPShootingConfig, solve_osqp_shooting, OSQP,
    )
    from .problems import single_track_lane_ocp

    spec = single_track_lane_ocp(horizon_steps=30).spec()

    # The two QP engines stop at different eps-level iterates, so the full
    # SQP paths diverge slightly; ~0.5% cost agreement is the right bar.
    admm = solve_osqp_collocation(spec, OSQPCollocationConfig())
    ip = solve_osqp_collocation(spec, OSQPCollocationConfig(qp_solver="ip"))
    np.testing.assert_allclose(float(ip.cost), float(admm.cost), rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(ip.controls), np.asarray(admm.controls), rtol=5e-2, atol=5e-3
    )

    admm_s = solve_osqp_shooting(spec, OSQPShootingConfig())
    ip_s = solve_osqp_shooting(spec, OSQPShootingConfig(qp_solver="ip"))
    np.testing.assert_allclose(float(ip_s.cost), float(admm_s.cost), rtol=5e-3)

    solver = OSQP()
    solver.set_params({"max_iterations": 5, "tolerance": 1e-4,
                       "max_ms": 1e9, "ip_qp": 1})
    assert solver.config.qp_solver == "ip"
