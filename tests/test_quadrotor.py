"""Quadrotor model (nx=12, nu=4 -- beyond the reference's model zoo).

Exercises the large-state route: nx=12 > 8, so the iLQR auto gate hands the
backward pass to the batched XLA scan (docs/BENCHMARKS.md nx=16 probe shows
that is also the faster backend there), and the solve must still reach a
stabilizing hover.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ocp import OCP
from multi_agent_solver_tpu.models import quadrotor_dynamics, HOVER_THRUST
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQRConfig,
    solve_ilqr,
    solve_ilqr_batched,
)


def hover_ocp(horizon_steps: int = 40) -> OCP:
    """Start 1 m off target with attitude error; regulate to hover at origin."""
    x0 = jnp.zeros(12).at[0].set(1.0).at[1].set(-0.5).at[2].set(0.5)
    x0 = x0.at[6].set(0.2).at[7].set(-0.1)
    w = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
                   2.0, 2.0, 2.0, 0.1, 0.1, 0.1])

    def stage_cost(x, u, t):
        du = u - jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0])
        ru = jnp.array([0.1, 1.0, 1.0, 1.0])
        return jnp.sum(w * x * x) + jnp.sum(ru * du * du)

    ocp = OCP(
        state_dim=12, control_dim=4, horizon_steps=horizon_steps, dt=0.05,
        initial_state=x0,
        dynamics=quadrotor_dynamics,
        stage_cost=stage_cost,
        terminal_cost=lambda x: 10.0 * jnp.sum(w * x * x),
        initial_controls=jnp.tile(
            jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0]), (horizon_steps, 1)
        ),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


class TestQuadrotor:
    def test_dynamics_hover_equilibrium(self):
        x = jnp.zeros(12)
        u = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0])
        dx = np.asarray(quadrotor_dynamics(x, u))
        np.testing.assert_allclose(dx, np.zeros(12), atol=1e-12)

    def test_dynamics_finite_through_gimbal_lock(self):
        x = jnp.zeros(12).at[7].set(np.pi / 2).at[10].set(1.0)
        u = jnp.array([HOVER_THRUST, 0.01, 0.01, 0.01])
        dx = quadrotor_dynamics(x, u)
        assert np.all(np.isfinite(np.asarray(dx)))
        A = jax.jacfwd(quadrotor_dynamics, 0)(x, u)
        assert np.all(np.isfinite(np.asarray(A)))

    def test_hover_regulation_converges(self):
        spec = hover_ocp().spec()
        result = solve_ilqr(spec, ILQRConfig(max_iterations=60, tolerance=1e-8))
        xs = np.asarray(result.states)
        # Position error shrinks by >10x over the horizon.
        assert np.linalg.norm(xs[-1, :3]) < 0.1 * np.linalg.norm(xs[0, :3])
        # Attitude comes back near level.
        assert np.linalg.norm(xs[-1, 6:9]) < 0.1
        assert np.isfinite(float(result.cost))

    def test_batched_matches_single(self):
        """nx=12 rides the scan backward; batched lanes match single solves."""
        spec = hover_ocp(horizon_steps=12).spec()
        dx0 = jnp.array([0.5, 1.0])
        specs = jax.vmap(
            lambda d: spec.replace(initial_state=spec.initial_state.at[0].set(d))
        )(dx0)
        config = ILQRConfig(max_iterations=6, tolerance=1e-8)
        batched = solve_ilqr_batched(specs, config)
        for i, d in enumerate(np.asarray(dx0)):
            single = solve_ilqr(
                spec.replace(initial_state=spec.initial_state.at[0].set(float(d))),
                config,
            )
            np.testing.assert_allclose(
                float(batched.cost[i]), float(single.cost), rtol=1e-8
            )
