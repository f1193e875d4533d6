"""iLQR solver tests: mirror parity, convergence quality, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_agent_solver_tpu import make_solver
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr

from .problems import lqr_ocp, single_track_lane_ocp
from .reference_mirror import ilqr_solve as mirror_ilqr


PARAMS = {"max_iterations": 10, "tolerance": 1e-5, "max_ms": 100}


def _single_track_callbacks():
    w_lane, w_speed, w_delta, w_acc, v_des, L = 10.0, 1.0, 0.1, 0.1, 1.0, 2.5

    def f(x, u):
        return np.array(
            [x[3] * np.cos(x[2]), x[3] * np.sin(x[2]), x[3] * np.tan(u[0]) / L, u[1]]
        )

    def fx(x, u):
        A = np.zeros((4, 4))
        A[0, 2] = -x[3] * np.sin(x[2])
        A[0, 3] = np.cos(x[2])
        A[1, 2] = x[3] * np.cos(x[2])
        A[1, 3] = np.sin(x[2])
        A[2, 3] = np.tan(u[0]) / L
        return A

    def fu(x, u):
        B = np.zeros((4, 2))
        B[2, 0] = x[3] / (L * np.cos(u[0]) ** 2)
        B[3, 1] = 1.0
        return B

    stage = lambda x, u, t: (
        w_lane * x[1] ** 2 + w_speed * (x[3] - v_des) ** 2
        + w_delta * u[0] ** 2 + w_acc * u[1] ** 2
    )
    terminal = lambda x: 0.0
    lx = lambda x, u, t: np.array([0.0, 2 * w_lane * x[1], 0.0, 2 * w_speed * (x[3] - v_des)])
    lu = lambda x, u, t: np.array([2 * w_delta * u[0], 2 * w_acc * u[1]])
    lxx = lambda x, u, t: np.diag([0.0, 2 * w_lane, 0.0, 2 * w_speed])
    luu = lambda x, u, t: np.diag([2 * w_delta, 2 * w_acc])
    lux = lambda x, u, t: np.zeros((2, 4))
    phix = lambda x: np.zeros(4)
    phixx = lambda x: np.zeros((4, 4))
    return f, fx, fu, stage, terminal, lx, lu, lxx, luu, lux, phix, phixx


class TestReferenceParity:
    """Continuous-Jacobian mode must track the reference algorithm exactly."""

    def test_single_track_matches_mirror(self):
        ocp = single_track_lane_ocp()
        solver = make_solver("ilqr", {**PARAMS, "continuous_jacobians": 1})
        result = solver.solve(ocp)

        cbs = _single_track_callbacks()
        X, U, cost, _ = mirror_ilqr(
            *cbs,
            x0=np.array([0.0, 1.0, 0.0, 0.0]),
            U0=np.zeros((80, 2)),
            dt=0.1,
            max_iterations=10,
            tolerance=1e-5,
            input_lower=np.array([-0.7, -1.0]),
            input_upper=np.array([0.7, 1.0]),
        )
        np.testing.assert_allclose(float(result.cost), cost, rtol=1e-9)
        np.testing.assert_allclose(np.array(result.controls), U, atol=1e-8)
        np.testing.assert_allclose(np.array(result.states), X, atol=1e-8)

    def test_lqr_matches_mirror(self):
        ocp = lqr_ocp()
        solver = make_solver("ilqr", {**PARAMS, "continuous_jacobians": 1,
                                      "max_iterations": 100})
        result = solver.solve(ocp)

        A = np.eye(4)
        B = np.eye(4)
        f = lambda x, u: A @ x + B @ u
        fx = lambda x, u: A
        fu = lambda x, u: B
        stage = lambda x, u, t: x @ x + u @ u
        terminal = lambda x: x @ x
        lx = lambda x, u, t: 2 * x
        lu = lambda x, u, t: 2 * u
        lxx = lambda x, u, t: 2 * np.eye(4)
        luu = lambda x, u, t: 2 * np.eye(4)
        lux = lambda x, u, t: np.zeros((4, 4))
        phix = lambda x: 2 * x
        phixx = lambda x: 2 * np.eye(4)

        x0 = np.zeros(4)
        x0[0] = 1.0
        X, U, cost, _ = mirror_ilqr(
            f, fx, fu, stage, terminal, lx, lu, lxx, luu, lux, phix, phixx,
            x0=x0, U0=np.zeros((10, 4)), dt=0.1, max_iterations=100, tolerance=1e-5,
        )
        np.testing.assert_allclose(float(result.cost), cost, rtol=1e-9)
        np.testing.assert_allclose(np.array(result.controls), U, atol=1e-9)


class TestConvergence:
    def test_discrete_mode_beats_continuous(self):
        """Exact discrete Jacobians reach the near-optimal basin (~179.9)
        where the reference's continuous-Jacobian recursion stalls (~508.6).
        The box-constrained optimum of this problem is ~176.3 (verified with
        projected Adam; see docs/PARITY.md)."""
        ocp = single_track_lane_ocp()
        res_disc = make_solver("ilqr", PARAMS).solve(ocp)
        ocp2 = single_track_lane_ocp()
        res_cont = make_solver("ilqr", {**PARAMS, "continuous_jacobians": 1}).solve(ocp2)
        assert float(res_disc.cost) < 181.0
        assert float(res_disc.cost) < float(res_cont.cost) / 2
        np.testing.assert_allclose(float(res_cont.cost), 508.59306030, rtol=1e-6)

    def test_lqr_finds_exact_optimum(self):
        """Discrete-Jacobian mode reaches the true optimum of the LQR example
        (18.130934, verified against Adam run to convergence); the reference's
        continuous-Jacobian recursion only reaches ~20.87."""
        ocp = lqr_ocp()
        result = make_solver("ilqr", {**PARAMS, "max_iterations": 100}).solve(ocp)
        assert bool(result.converged)
        np.testing.assert_allclose(float(result.cost), 18.130933969756, rtol=1e-9)
        assert int(result.iterations) <= 3

    def test_boxqp_reaches_constrained_optimum(self):
        """Control-limited DDP gains (boxqp=1) reach the true box-constrained
        optimum 176.2785 (verified with projected Adam, docs/PARITY.md) where
        the reference's clamp-based forward pass stalls at ~179.9."""
        ocp = single_track_lane_ocp()
        result = make_solver(
            "ilqr", {"max_iterations": 60, "tolerance": 1e-9, "max_ms": 1e9,
                     "boxqp": 1},
        ).solve(ocp)
        np.testing.assert_allclose(float(result.cost), 176.27854, rtol=1e-4)
        U = np.array(result.controls)
        assert (np.abs(U[:, 0]) <= 0.7 + 1e-9).all()
        assert (np.abs(U[:, 1]) <= 1.0 + 1e-9).all()

    def test_respects_input_bounds(self):
        ocp = single_track_lane_ocp()
        result = make_solver("ilqr", PARAMS).solve(ocp)
        U = np.array(result.controls)
        assert (U[:, 0] >= -0.7 - 1e-12).all() and (U[:, 0] <= 0.7 + 1e-12).all()
        assert (U[:, 1] >= -1.0 - 1e-12).all() and (U[:, 1] <= 1.0 + 1e-12).all()

    def test_warm_start_converges_immediately(self):
        ocp = single_track_lane_ocp()
        solver = make_solver("ilqr", PARAMS)
        solver.solve(ocp)
        first = ocp.best_cost
        ocp.update_initial_with_best()
        result2 = solver.solve(ocp)
        assert float(result2.cost) <= first + 1e-9
        assert int(result2.iterations) <= 2


class TestBatching:
    def test_vmap_matches_single_solves(self):
        """Batched-vs-single consistency (the core TPU scaling primitive)."""
        ocp = single_track_lane_ocp()
        spec = ocp.spec()
        config = ILQRConfig(max_iterations=10, tolerance=1e-5)

        y_offsets = jnp.array([0.5, 1.0, 1.5, 2.0])
        x0s = jnp.tile(spec.initial_state, (4, 1)).at[:, 1].set(y_offsets)
        specs = jax.vmap(lambda x0: spec.replace(initial_state=x0))(x0s)

        batched = jax.jit(jax.vmap(lambda s: solve_ilqr(s, config)))(specs)
        for i in range(4):
            single = solve_ilqr(spec.replace(initial_state=x0s[i]), config)
            np.testing.assert_allclose(
                float(batched.cost[i]), float(single.cost), rtol=1e-7,
                err_msg=f"batch element {i}",
            )


class TestBoxQPDimensionSweep:
    def test_boxqp_gains_nu4_match_projected_enumeration(self):
        """nu = 4 enumeration (81 active sets) solves the box QP exactly."""
        import itertools

        from multi_agent_solver_tpu.ops.boxqp import boxqp_gains

        rng = np.random.RandomState(3)
        for trial in range(10):
            nu, nx = 4, 5
            M = rng.randn(nu, nu)
            Quu = jnp.asarray(M @ M.T + 0.5 * np.eye(nu))
            qu = jnp.asarray(rng.randn(nu))
            Qux = jnp.asarray(rng.randn(nu, nx))
            lb = jnp.asarray(-np.abs(rng.rand(nu)) - 0.01)
            ub = jnp.asarray(np.abs(rng.rand(nu)) + 0.01)
            k, K = boxqp_gains(Quu, qu, Qux, lb, ub)

            # Brute-force reference: dense grid projection via scipy-free
            # quadratic minimization over the box (projected gradient).
            Q = np.asarray(Quu)
            q = np.asarray(qu)
            lo, hi = np.asarray(lb), np.asarray(ub)
            x = np.zeros(nu)
            step = 1.0 / np.linalg.eigvalsh(Q).max()
            for _ in range(20000):
                x = np.clip(x - step * (Q @ x + q), lo, hi)
            np.testing.assert_allclose(np.asarray(k), x, atol=1e-6)
            # Clamped dims -> zero feedback rows.
            clamped = (np.abs(x - lo) < 1e-9) | (np.abs(x - hi) < 1e-9)
            assert np.all(np.asarray(K)[clamped] == 0.0)
