"""Fully lane-resident fused iteration loop vs the kernel-per-phase path.

The fused path (solvers/ilqr.py::_solve_ilqr_batched_fused) tiles once and
runs linearize / terminal-derivs / Riccati / select as four lane-layout
kernels per iteration with zero layout conversions -- measured 1.8x the
kernel-per-phase path on the chip (docs/BENCHMARKS.md).  These tests pin
its equivalence on CPU interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

from .problems import single_track_lane_ocp


def _specs(B=5):
    spec = single_track_lane_ocp().spec()
    y = jnp.linspace(0.4, 2.2, B)
    x0s = jnp.tile(spec.initial_state, (B, 1)).at[:, 1].set(y)
    return jax.vmap(lambda x0: spec.replace(initial_state=x0))(x0s)


class TestFusedLoop:
    def test_matches_regular_path(self):
        specs = _specs()
        config = ILQRConfig(max_iterations=10, tolerance=1e-5)
        fused = solve_ilqr_batched(specs, config)              # auto -> fused
        regular = solve_ilqr_batched(specs, config, fused=False)
        np.testing.assert_allclose(
            np.asarray(fused.cost), np.asarray(regular.cost), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused.controls), np.asarray(regular.controls), atol=2e-4
        )

    def test_boxqp_mode_matches(self):
        specs = _specs(3)
        config = ILQRConfig(max_iterations=40, tolerance=1e-9,
                            bound_mode="boxqp")
        fused = solve_ilqr_batched(specs, config)
        regular = solve_ilqr_batched(specs, config, fused=False)
        np.testing.assert_allclose(
            np.asarray(fused.cost), np.asarray(regular.cost), rtol=1e-4
        )
        U = np.asarray(fused.controls)
        assert (np.abs(U[..., 0]) <= 0.7 + 1e-5).all()
        assert (np.abs(U[..., 1]) <= 1.0 + 1e-5).all()

    def test_non_tile_multiple_batch(self):
        """Batch sizes off the 1024-lane tile boundary pad correctly."""
        specs = _specs(5)
        config = ILQRConfig(max_iterations=6, tolerance=1e-5)
        fused = solve_ilqr_batched(specs, config)
        singles = solve_ilqr_batched(specs, config, fused=False)
        np.testing.assert_allclose(
            np.asarray(fused.cost), np.asarray(singles.cost), rtol=1e-5
        )

    def test_ineligible_problems_fall_back(self):
        """Constrained problems skip the fused path but still solve."""
        from multi_agent_solver_tpu.ocp import OCP
        from multi_agent_solver_tpu.models import single_track_model

        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=30, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5], jnp.float64),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: x[1] ** 2 + 0.1 * (u[0] ** 2 + u[1] ** 2),
            inequality_constraints=lambda x, u: jnp.array([x[3] - 1.5]),
        )
        ocp.initialize_problem()
        spec = ocp.spec()
        specs = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), spec)
        config = ILQRConfig(max_iterations=10, tolerance=1e-6)
        r = solve_ilqr_batched(specs, config)
        assert np.isfinite(np.asarray(r.cost)).all()
