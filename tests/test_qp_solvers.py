"""ADMM QP backend and the two SQP solvers built on it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sco

from multi_agent_solver_tpu import make_solver
from multi_agent_solver_tpu.solvers.admm_qp import ADMMConfig, solve_box_qp

from .problems import lqr_ocp, single_track_lane_ocp

TIGHT = ADMMConfig(max_iterations=4000, eps_abs=1e-7, eps_rel=1e-7)


def _random_qp(seed, n=24, m=32, eq_rows=2, scale_decades=0.0):
    rng = np.random.RandomState(seed)
    P = rng.uniform(0.1, 2.0, n)
    q = rng.randn(n)
    A = rng.randn(m, n)
    lb = rng.uniform(-2.0, -0.5, m)
    ub = rng.uniform(0.5, 2.0, m)
    for i in range(eq_rows):
        lb[i] = ub[i] = rng.uniform(-1, 1)
    if scale_decades:
        S = 10.0 ** rng.uniform(-scale_decades, scale_decades, n)
        P, q, A = P * S * S, q * S, A / S[None, :]
    return map(jnp.asarray, (P, q, A, lb, ub))


def _scipy_solution(P, q, A, lb, ub):
    P, q, A, lb, ub = map(np.asarray, (P, q, A, lb, ub))
    res = sco.minimize(
        lambda x: 0.5 * x @ (P * x) + q @ x,
        np.zeros_like(q),
        jac=lambda x: P * x + q,
        constraints=[sco.LinearConstraint(A, lb, ub)],
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    assert res.success
    return res


class TestADMM:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scipy(self, seed):
        P, q, A, lb, ub = _random_qp(seed)
        sol = solve_box_qp(P, q, A, lb, ub, TIGHT)
        ref = _scipy_solution(P, q, A, lb, ub)
        assert bool(sol.converged)
        np.testing.assert_allclose(np.array(sol.x), ref.x, atol=5e-5)

    def test_badly_scaled_problem_converges(self):
        """Ruiz equilibration handles 6 decades of column scaling."""
        P, q, A, lb, ub = _random_qp(3, scale_decades=3.0)
        sol = solve_box_qp(P, q, A, lb, ub, TIGHT)
        ref = _scipy_solution(P, q, A, lb, ub)
        assert bool(sol.converged)
        obj = 0.5 * np.array(sol.x) @ (np.array(P) * np.array(sol.x)) + np.array(q) @ np.array(sol.x)
        np.testing.assert_allclose(obj, ref.fun, rtol=1e-4)

    def test_equality_rows_satisfied(self):
        P, q, A, lb, ub = _random_qp(4, eq_rows=4)
        sol = solve_box_qp(P, q, A, lb, ub, TIGHT)
        resid = np.array(A) @ np.array(sol.x)
        np.testing.assert_allclose(resid[:4], np.array(lb)[:4], atol=1e-5)

    def test_vmap_batching(self):
        qps = [_random_qp(s) for s in range(4)]
        stack = [jnp.stack(parts) for parts in zip(*qps)]
        batched = jax.jit(
            jax.vmap(lambda P, q, A, lb, ub: solve_box_qp(P, q, A, lb, ub, TIGHT))
        )(*stack)
        for i in range(4):
            single = solve_box_qp(*[s[i] for s in stack], TIGHT)
            np.testing.assert_allclose(
                np.array(batched.x[i]), np.array(single.x), atol=1e-6
            )

    def test_polish_recovers_accuracy_from_loose_solve(self):
        """OSQP-style polish: a 1e-3-tolerance solve polishes to ~1e-9
        solution error via the reweighted-active-set refinement."""
        import dataclasses

        P, q, A, lb, ub = _random_qp(6, eq_rows=1)
        ref = _scipy_solution(P, q, A, lb, ub)
        loose = ADMMConfig(max_iterations=200, eps_abs=1e-3, eps_rel=1e-3,
                           polish=False)
        unpolished = solve_box_qp(P, q, A, lb, ub, loose)
        polished = solve_box_qp(
            P, q, A, lb, ub, dataclasses.replace(loose, polish=True)
        )
        err_un = np.abs(np.array(unpolished.x) - ref.x).max()
        err_po = np.abs(np.array(polished.x) - ref.x).max()
        assert err_po < 1e-6
        assert err_po < err_un / 10

    def test_warm_start_reduces_iterations(self):
        P, q, A, lb, ub = _random_qp(5)
        cold = solve_box_qp(P, q, A, lb, ub, TIGHT)
        warm = solve_box_qp(P, q, A, lb, ub, TIGHT, x0=cold.x, y0=cold.y)
        assert int(warm.iterations) < int(cold.iterations)


class TestShootingSQP:
    def test_single_track(self):
        """Crude shooting QP (no affine defect term, continuous Jacobians --
        parity with osqp.hpp:344-361) still descends from 880."""
        ocp = single_track_lane_ocp()
        result = make_solver("osqp", {"max_iterations": 20, "tolerance": 1e-5,
                                      "max_ms": 1e9}).solve(ocp)
        assert float(result.cost) < 600.0
        assert np.isfinite(float(result.cost))

    def test_lqr_descends(self):
        ocp = lqr_ocp()
        result = make_solver("osqp", {"max_iterations": 30, "tolerance": 1e-6,
                                      "max_ms": 1e9}).solve(ocp)
        # zero-control initial cost for this LQR is ~11x the optimum
        assert float(result.cost) < float(ocp.spec().cost(
            ocp.spec().rollout(jnp.zeros((10, 4))), jnp.zeros((10, 4))))


class TestCollocationSQP:
    def test_single_track_reaches_optimum(self):
        """Trapezoidal collocation is the mathematically sound reference
        solver; it should reach the constrained optimum (~176.2, see
        docs/PARITY.md)."""
        ocp = single_track_lane_ocp()
        result = make_solver(
            "osqp_collocation",
            {"max_iterations": 20, "tolerance": 1e-5, "max_ms": 1e9},
        ).solve(ocp)
        assert float(result.cost) < 176.5

    def test_trapezoidal_defects_satisfied(self):
        ocp = single_track_lane_ocp()
        result = make_solver(
            "osqp_collocation",
            {"max_iterations": 20, "tolerance": 1e-5, "max_ms": 1e9},
        ).solve(ocp)
        X = np.array(result.states)
        U = np.array(result.controls)
        spec = ocp.spec()
        f = lambda x, u: np.array(spec.dynamics(jnp.asarray(x), jnp.asarray(u)))
        defects = []
        for t in range(spec.horizon_steps):
            u_t = U[t]
            u_tp1 = U[min(t + 1, spec.horizon_steps - 1)]
            d = X[t + 1] - X[t] - 0.5 * spec.dt * (f(X[t], u_t) + f(X[t + 1], u_tp1))
            defects.append(np.abs(d).max())
        assert max(defects) < 1e-3

    def test_step_limit_keeps_singular_problem_finite(self):
        """The rocket's thrust/max(m, eps) dynamics are singular as m -> 0;
        the reference's unguarded full steps diverge to NaN there.  The
        opt-in step_limit trust region keeps iterates finite (the model
        pathology itself is preserved -- see docs/PARITY.md)."""
        from multi_agent_solver_tpu.examples.rocket_max_altitude import (
            create_max_altitude_rocket_ocp,
        )

        ocp = create_max_altitude_rocket_ocp()
        result = make_solver(
            "osqp_collocation",
            {"max_iterations": 30, "tolerance": 1e-6, "max_ms": 1e9,
             "step_limit": 1.0},
        ).solve(ocp)
        assert np.isfinite(np.array(result.states)).all()
        assert np.isfinite(float(result.cost))

    def test_pendulum_swing_up_succeeds(self):
        """The reference's recommended solver for the nonconvex swing-up
        (README.md:26): final angle must be upright mod 2*pi."""
        from multi_agent_solver_tpu.examples.pendulum_swing_up import (
            create_pendulum_swingup_ocp,
        )

        ocp = create_pendulum_swingup_ocp()
        result = make_solver(
            "osqp_collocation",
            {"max_iterations": 200, "tolerance": 1e-3, "max_ms": 1e9},
        ).solve(ocp)
        theta_T = float(result.states[-1, 0])
        omega_T = float(result.states[-1, 1])
        upright_error = 1.0 - np.cos(theta_T)
        assert upright_error < 0.05, f"theta_T={theta_T}"
        assert abs(omega_T) < 0.5
