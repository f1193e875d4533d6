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

    def test_mesh_coupled_nash_matches_single_device(self):
        """Coupled game sharded over the agent mesh axis == stacked path.

        8 cars, one per device; each sweep all-gathers the others' frozen
        plans across the mesh (VERDICT r1 item 6)."""
        self._coupled_mesh_case(k_neighbors=None)

    def test_mesh_coupled_nash_knn_matches_single_device(self):
        self._coupled_mesh_case(k_neighbors=3)

    @staticmethod
    def _coupled_mesh_case(k_neighbors):
        from multi_agent_solver_tpu import make_solver, make_strategy, solve_multi_agent
        from multi_agent_solver_tpu.parallel.mesh import mesh_coupled_nash_solve
        from multi_agent_solver_tpu.strategies.base import stack_agent_specs

        from .problems import head_on_fleet_problem

        params = {"max_iterations": 10, "tolerance": 1e-6}
        max_outer = 3

        # Single-device stacked Nash baseline.
        prob_a = head_on_fleet_problem(n=8, coupling_neighbors=k_neighbors)
        strategy = make_strategy("sequential", make_solver("ilqr"), params, max_outer)
        solve_multi_agent(strategy, prob_a)
        base_costs = np.array([float(b.agent.ocp.best_cost) for b in prob_a.blocks])

        # Agent-sharded mesh path on a fresh, identical problem.
        prob_b = head_on_fleet_problem(n=8, coupling_neighbors=k_neighbors)
        prob_b.compute_offsets()
        specs = stack_agent_specs(prob_b)
        solver = make_solver("ilqr")
        config = type(solver).config_cls.from_params(params)
        mesh = make_mesh(n_data=1, n_agent=8)
        states, controls, costs, total = mesh_coupled_nash_solve(
            lambda s: type(solver)._solve_batched_fn(s, config),
            specs,
            prob_b.inter_agent_cost,
            mesh,
            max_outer=max_outer,
            k_neighbors=k_neighbors,
        )
        assert states.shape[0] == 8 and controls.shape[0] == 8
        np.testing.assert_allclose(np.array(costs), base_costs, rtol=1e-6)
        np.testing.assert_allclose(float(total), base_costs.sum(), rtol=1e-6)

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


class TestMeshBench:
    def test_weak_scaling_harness_runs(self, tmp_path, capsys):
        """scripts/bench_mesh.py (the pod weak-scaling harness,
        docs/MULTIHOST.md) must run unchanged on the virtual mesh and emit
        a well-formed artifact with sane costs."""
        import importlib.util
        import json as json_mod
        import pathlib

        root = pathlib.Path(__file__).resolve().parents[1]
        spec_mod = importlib.util.spec_from_file_location(
            "bench_mesh", root / "scripts" / "bench_mesh.py"
        )
        bench_mesh = importlib.util.module_from_spec(spec_mod)
        spec_mod.loader.exec_module(bench_mesh)

        out = tmp_path / "mesh.json"
        rc = bench_mesh.main([
            "--per-device-batch", "8", "--iters", "2", "--horizon", "10",
            "--reps", "1", "--device-counts", "1", "2", "--json", str(out),
        ])
        assert rc == 0
        artifact = json_mod.loads(out.read_text())
        assert [r["devices"] for r in artifact["rows"]] == [1, 2]
        for r in artifact["rows"]:
            assert r["batch"] == 8 * r["devices"]
            assert np.isfinite(r["median_cost"])
            assert r["solves_per_s"] > 0
