"""Batching and mesh scale-out tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.parallel.batching import batch_solve, batch_spec_over
from multi_agent_solver_tpu.parallel.mesh import (
    make_mesh,
    mesh_batch_solve,
    mesh_multi_agent_solve,
)
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr

from .problems import single_track_lane_ocp

CONFIG = ILQRConfig(max_iterations=10, tolerance=1e-5)


def _solve(spec):
    return solve_ilqr(spec, CONFIG)


def _batched_specs(batch=8):
    spec = single_track_lane_ocp().spec()
    y = jnp.linspace(0.5, 2.0, batch)
    x0 = jnp.tile(spec.initial_state, (batch, 1)).at[:, 1].set(y)
    return spec, batch_spec_over(spec, initial_state=x0)


class TestBatching:
    def test_batch_solve_matches_loop(self):
        spec, specs = _batched_specs(4)
        result = batch_solve(_solve, specs)
        for i in range(4):
            single = _solve(
                spec.replace(initial_state=specs.initial_state[i])
            )
            np.testing.assert_allclose(
                float(result.cost[i]), float(single.cost), rtol=1e-7
            )

    def test_batch_spec_over_rejects_mismatch(self):
        spec = single_track_lane_ocp().spec()
        try:
            batch_spec_over(
                spec,
                initial_state=jnp.zeros((4, 4)),
                initial_controls=jnp.zeros((8, 80, 2)),
            )
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestMesh:
    def test_mesh_batch_solve_matches_single_device(self):
        assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
        spec, specs = _batched_specs(8)
        mesh = make_mesh(n_data=8, n_agent=1)
        sharded = mesh_batch_solve(_solve, specs, mesh)
        plain = batch_solve(_solve, specs)
        np.testing.assert_allclose(
            np.array(sharded.cost), np.array(plain.cost), rtol=1e-6
        )

    def test_mesh_fast_path_shards_pallas_kernels(self):
        """shard_map of the fused batched solver: each device runs the
        Pallas kernels on its local batch slice."""
        from multi_agent_solver_tpu.parallel.mesh import mesh_batch_solve_fast
        from multi_agent_solver_tpu.solvers.ilqr import solve_ilqr_batched

        spec, specs = _batched_specs(8)
        mesh = make_mesh(n_data=8, n_agent=1)
        sharded = mesh_batch_solve_fast(
            lambda s: solve_ilqr_batched(s, CONFIG), specs, mesh
        )
        plain = jax.jit(lambda s: solve_ilqr_batched(s, CONFIG))(specs)
        np.testing.assert_allclose(
            np.array(sharded.cost), np.array(plain.cost), rtol=1e-5
        )

    def test_mesh_multi_agent_grid(self):
        spec = single_track_lane_ocp().spec()
        B, N = 4, 2
        y = jnp.linspace(0.5, 2.0, B * N).reshape(B, N)
        x0 = jnp.tile(spec.initial_state, (B, N, 1)).at[:, :, 1].set(y)
        specs = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (B, N) + leaf.shape), spec
        ).replace(initial_state=x0)

        mesh = make_mesh(n_data=4, n_agent=2)
        result, totals = mesh_multi_agent_solve(_solve, specs, mesh)
        assert result.cost.shape == (B, N)
        np.testing.assert_allclose(
            np.array(totals), np.array(result.cost).sum(axis=1), rtol=1e-6
        )
