"""Dynamic bicycle model (nx=6, beyond the reference's model zoo).

Exercises the round-2 lifted fused-kernel gate (nx <= 8): the batched iLQR
solve of a 6-state lane change routes through the Pallas backward on TPU
and reaches the same answer as the XLA scan path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ocp import OCP
from multi_agent_solver_tpu.models import dynamic_bicycle_model
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr, solve_ilqr_batched


def lane_change_ocp(horizon_steps: int = 30) -> OCP:
    """Double-lane-change-ish: start offset 2 m at 15 m/s, regulate to y=0."""
    ocp = OCP(
        state_dim=6, control_dim=2, horizon_steps=horizon_steps, dt=0.05,
        initial_state=jnp.array([0.0, 2.0, 0.0, 15.0, 0.0, 0.0]),
        dynamics=dynamic_bicycle_model,
        stage_cost=lambda x, u, t: (
            2.0 * x[1] ** 2 + 0.5 * x[2] ** 2 + 0.05 * (x[3] - 15.0) ** 2
            + 2.0 * u[0] ** 2 + 0.1 * u[1] ** 2
        ),
        input_lower_bounds=jnp.array([-0.4, -4.0]),
        input_upper_bounds=jnp.array([0.4, 2.0]),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


class TestDynamicBicycle:
    def test_dynamics_finite_and_standstill_safe(self):
        x = jnp.array([0.0, 0.0, 0.1, 0.0, 0.2, 0.3])   # vx = 0: slip floor
        u = jnp.array([0.1, 1.0])
        dx = dynamic_bicycle_model(x, u)
        assert np.all(np.isfinite(np.asarray(dx)))
        # Jacobians stay finite through the floor too.
        A = jax.jacfwd(dynamic_bicycle_model, 0)(x, u)
        assert np.all(np.isfinite(np.asarray(A)))

    def test_lane_change_converges(self):
        spec = lane_change_ocp().spec()
        result = solve_ilqr(spec, ILQRConfig(max_iterations=40, tolerance=1e-8))
        ys = np.asarray(result.states)[:, 1]
        assert abs(ys[0]) == 2.0
        assert abs(ys[-1]) < 0.15, ys[-1]
        assert float(result.cost) < 60.0

    def test_batched_pallas_matches_scan(self):
        """nx=6 rides the lifted fused-kernel gate; answers match the scan."""
        spec = lane_change_ocp(horizon_steps=12).spec()
        y0 = jnp.array([1.0, 2.0])
        specs = jax.vmap(
            lambda y: spec.replace(initial_state=spec.initial_state.at[1].set(y))
        )(y0)
        config = ILQRConfig(max_iterations=8, tolerance=1e-8)
        fast = solve_ilqr_batched(specs, config)                      # pallas (interpret on CPU)
        ref = solve_ilqr_batched(specs, config, backward="scan", fused=False)
        np.testing.assert_allclose(
            np.asarray(fast.cost), np.asarray(ref.cost), rtol=1e-5
        )
