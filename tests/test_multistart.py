"""Multi-start solving tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.parallel.multistart import (
    multistart_solve,
    random_control_starts,
)
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

from .problems import single_track_lane_ocp


class TestMultistart:
    def test_starts_shapes_and_bounds(self):
        spec = single_track_lane_ocp().spec()
        starts = random_control_starts(jax.random.PRNGKey(0), spec, 8)
        assert starts.shape == (8, 80, 2)
        np.testing.assert_array_equal(
            np.array(starts[0]), np.array(spec.initial_controls)
        )  # lane 0 preserves the warm start
        # sinusoid amplitudes stay within 40% of the input range around center
        assert float(jnp.abs(starts[1:, :, 0]).max()) <= 0.7
        assert float(jnp.abs(starts[1:, :, 1]).max()) <= 1.0

    def test_never_worse_than_single_start(self):
        spec = single_track_lane_ocp().spec()
        config = ILQRConfig(max_iterations=10, tolerance=1e-5)
        starts = random_control_starts(jax.random.PRNGKey(1), spec, 6)
        best = multistart_solve(
            lambda s: solve_ilqr_batched(s, config), spec, starts
        )
        single = solve_ilqr_batched(
            jax.tree_util.tree_map(lambda l: l[None], spec), config
        )
        assert float(best.cost) <= float(single.cost[0]) + 1e-6

    def test_pendulum_swing_up_succeeds_with_ilqr(self):
        """Single-start iLQR stalls at the downward equilibrium on the
        nonconvex swing-up; 32 sinusoidal starts find the upright basin."""
        from multi_agent_solver_tpu.examples.pendulum_swing_up import (
            create_pendulum_swingup_ocp,
        )

        spec = create_pendulum_swingup_ocp().spec()
        config = ILQRConfig(max_iterations=300, tolerance=1e-6)
        starts = random_control_starts(jax.random.PRNGKey(0), spec, 32)
        best = jax.jit(
            lambda s: multistart_solve(
                lambda sp: solve_ilqr_batched(sp, config), spec, s
            )
        )(starts)
        upright_error = 1.0 - np.cos(float(best.states[-1, 0]))
        assert upright_error < 0.05, f"theta_T={float(best.states[-1, 0])}"
