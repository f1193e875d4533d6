"""Core layer tests: integrators, OCP lifecycle, derivatives, AL helpers.

Re-expresses the reference's unit tests (tests/ocp_tests.cpp:21-177) plus
AD-vs-FD cross checks the reference cannot do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_agent_solver_tpu import OCP, integrate_horizon, integrate_rk4
from multi_agent_solver_tpu.finite_differences import finite_differences_gradient
from multi_agent_solver_tpu.models import (
    pendulum_dynamics,
    pendulum_state_jacobian,
    pendulum_control_jacobian,
    single_track_model,
    single_track_state_jacobian,
    single_track_control_jacobian,
)

from .reference_mirror import rk4_step, rollout as np_rollout


def _simple_integrator_ocp(nx=2, nu=2, T=6, dt=0.1):
    """create_integrator analogue (ocp_tests.cpp:13-18): x_dot = u."""
    ocp = OCP(
        state_dim=nx,
        control_dim=nu,
        horizon_steps=T,
        dt=dt,
        initial_state=jnp.zeros(nx),
        dynamics=lambda x, u: u,
        stage_cost=lambda x, u, t: jnp.sum(x**2) + jnp.sum(u**2),
        terminal_cost=lambda x: jnp.sum(x**2),
    )
    ocp.initialize_problem()
    return ocp


class TestIntegrators:
    def test_rk4_matches_mirror(self):
        x = jnp.array([0.3, -0.2])
        u = jnp.array([0.5])
        got = integrate_rk4(x, u, 0.05, pendulum_dynamics)
        want = rk4_step(
            lambda x, u: np.array(pendulum_dynamics(jnp.asarray(x), jnp.asarray(u))),
            np.array(x), np.array(u), 0.05,
        )
        np.testing.assert_allclose(np.array(got), want, rtol=1e-12)

    def test_horizon_rollout_matches_mirror(self):
        x0 = jnp.array([0.0, 1.0, 0.0, 0.0])
        U = jnp.asarray(np.random.RandomState(0).uniform(-0.3, 0.3, (20, 2)))
        got = integrate_horizon(x0, U, 0.1, single_track_model)
        want = np_rollout(
            lambda x, u: np.array(single_track_model(jnp.asarray(x), jnp.asarray(u))),
            np.array(x0), np.array(U), 0.1,
        )
        assert got.shape == (21, 4)
        np.testing.assert_allclose(np.array(got), want, rtol=1e-10)

    def test_rk4_exact_for_linear(self):
        # For x_dot = -x, RK4 one step should match exp(-dt) to O(dt^5).
        x = jnp.array([1.0])
        got = integrate_rk4(x, jnp.zeros(1), 0.1, lambda x, u: -x)
        np.testing.assert_allclose(float(got[0]), np.exp(-0.1), atol=1e-8)


class TestOCP:
    def test_initialize_sets_defaults_and_best_cost(self):
        """ocp_tests.cpp:21-54."""
        ocp = _simple_integrator_ocp()
        assert ocp.best_states.shape == (7, 2)
        assert ocp.best_controls.shape == (6, 2)
        assert ocp.best_cost == 0.0  # zero init, zero cost
        spec = ocp.spec()
        # derivative oracles installed and well-shaped
        x, u, t = jnp.zeros(2), jnp.zeros(2), jnp.asarray(0)
        assert spec.derivs.fx(x, u).shape == (2, 2)
        assert spec.derivs.fu(x, u).shape == (2, 2)
        assert spec.derivs.lx(x, u, t).shape == (2,)
        assert spec.derivs.lxx(x, u, t).shape == (2, 2)
        assert spec.derivs.lux(x, u, t).shape == (2, 2)
        assert spec.derivs.phixx(x).shape == (2, 2)
        assert ocp.verify_problem()

    def test_mis_shaped_controls_are_zeroed(self):
        """initialize_problem zero-fills wrong-shape warm starts (ocp.hpp:105-108)."""
        ocp = OCP(
            state_dim=2,
            control_dim=2,
            horizon_steps=6,
            dt=0.1,
            initial_state=jnp.zeros(2),
            dynamics=lambda x, u: u,
            initial_controls=jnp.ones((3, 2)),  # wrong horizon
        )
        ocp.initialize_problem()
        assert ocp.initial_controls.shape == (6, 2)
        assert float(jnp.abs(ocp.initial_controls).max()) == 0.0

    def test_update_initial_with_best_copies(self):
        """ocp_tests.cpp:56-74."""
        ocp = _simple_integrator_ocp()
        new_u = jnp.ones_like(ocp.best_controls)
        new_x = ocp.spec().rollout(new_u)
        ocp.set_result(new_x, new_u, 123.0)
        ocp.update_initial_with_best()
        np.testing.assert_array_equal(np.array(ocp.initial_controls), np.array(new_u))
        np.testing.assert_array_equal(np.array(ocp.initial_states), np.array(new_x))
        spec = ocp.spec()
        np.testing.assert_array_equal(np.array(spec.initial_controls), np.array(new_u))

    def test_objective_synthesis(self):
        ocp = _simple_integrator_ocp()
        spec = ocp.spec()
        U = jnp.ones((6, 2)) * 0.1
        X = spec.rollout(U)
        want = sum(
            float(jnp.sum(X[t] ** 2) + jnp.sum(U[t] ** 2)) for t in range(6)
        ) + float(jnp.sum(X[-1] ** 2))
        np.testing.assert_allclose(float(spec.cost(X, U)), want, rtol=1e-12)


class TestDerivatives:
    def test_ad_matches_analytic_jacobians(self):
        for dyn, ja, jb, nx, nu in [
            (pendulum_dynamics, pendulum_state_jacobian, pendulum_control_jacobian, 2, 1),
            (single_track_model, single_track_state_jacobian, single_track_control_jacobian, 4, 2),
        ]:
            rng = np.random.RandomState(1)
            x = jnp.asarray(rng.uniform(-1, 1, nx))
            u = jnp.asarray(rng.uniform(-0.4, 0.4, nu))
            np.testing.assert_allclose(
                np.array(jax.jacfwd(dyn, 0)(x, u)), np.array(ja(x, u)), atol=1e-10
            )
            np.testing.assert_allclose(
                np.array(jax.jacfwd(dyn, 1)(x, u)), np.array(jb(x, u)), atol=1e-10
            )

    def test_fd_mode_matches_ad(self):
        ocp_ad = _simple_integrator_ocp()
        ocp_fd = _simple_integrator_ocp()
        ocp_fd.derivative_mode = "fd"
        ocp_fd.invalidate()
        x = jnp.array([0.3, -0.7])
        u = jnp.array([0.2, 0.9])
        t = jnp.asarray(2)
        da, df = ocp_ad.spec().derivs, ocp_fd.spec().derivs
        np.testing.assert_allclose(np.array(da.lx(x, u, t)), np.array(df.lx(x, u, t)), atol=1e-5)
        np.testing.assert_allclose(np.array(da.lxx(x, u, t)), np.array(df.lxx(x, u, t)), atol=1e-4)
        np.testing.assert_allclose(np.array(da.luu(x, u, t)), np.array(df.luu(x, u, t)), atol=1e-4)
        np.testing.assert_allclose(np.array(da.phix(x)), np.array(df.phix(x)), atol=1e-5)

    def test_shooting_fd_gradient_matches_ad(self):
        """ocp_tests.cpp:156-177 (FD vs analytic on quadratic objective),
        strengthened to the nonlinear single-track problem."""
        from .problems import single_track_lane_ocp

        ocp = single_track_lane_ocp()
        spec = ocp.spec()
        U = jnp.asarray(np.random.RandomState(2).uniform(-0.2, 0.2, (80, 2)))

        def total(u):
            X = spec.rollout(u)
            return spec.cost(X, u)

        g_ad = jax.grad(total)(U)
        g_fd = finite_differences_gradient(
            spec.initial_state, U, spec.dynamics, spec.objective_function, spec.dt
        )
        np.testing.assert_allclose(np.array(g_fd), np.array(g_ad), atol=1e-3)


class TestSpdInvUnrolled:
    def test_matches_numpy_inverse(self):
        """ops/small.py::spd_inv_unrolled (the batched-tiny-LU fix behind the
        round-3 QP-family speedup) is exact for SPD blocks of every size the
        KKT factor uses."""
        from multi_agent_solver_tpu.ops.small import spd_inv_unrolled

        rng = np.random.default_rng(3)
        for n in (1, 2, 3, 6, 8, 12, 16):
            A = rng.normal(size=(4, 7, n, n))
            Q = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
            got = np.asarray(spd_inv_unrolled(jnp.asarray(Q)))
            np.testing.assert_allclose(got, np.linalg.inv(Q), atol=1e-9)
