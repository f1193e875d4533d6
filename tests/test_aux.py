"""Auxiliary subsystems: checkpointing, FD-parity mode, debug logging,
heterogeneous-agent strategy fallback."""

import io
import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu import (
    Agent,
    MultiAgentProblem,
    OCP,
    make_solver,
    make_strategy,
    solve_multi_agent,
)
from multi_agent_solver_tpu.utils.checkpoint import (
    load_pytree,
    load_warm_start,
    save_pytree,
    save_warm_start,
)

from .problems import single_track_lane_ocp

PARAMS = {"max_iterations": 10, "tolerance": 1e-5, "max_ms": 100}


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        tree = {
            "a": jnp.arange(6.0).reshape(2, 3),
            "b": [jnp.ones(4), jnp.asarray(3)],
        }
        path = tmp_path / "ckpt.npz"
        save_pytree(path, tree)
        restored = load_pytree(path, like=tree)
        np.testing.assert_array_equal(np.array(restored["a"]), np.array(tree["a"]))
        np.testing.assert_array_equal(np.array(restored["b"][0]), np.ones(4))
        assert int(restored["b"][1]) == 3

    def test_warm_start_roundtrip(self, tmp_path):
        ocp = single_track_lane_ocp()
        solver = make_solver("ilqr", PARAMS)
        solver.solve(ocp)
        path = tmp_path / "warm.npz"
        save_warm_start(path, ocp.best_states, ocp.best_controls)
        warm = load_warm_start(path)
        np.testing.assert_allclose(
            np.array(warm["controls"]), np.array(ocp.best_controls)
        )
        # Resume: seed a fresh problem with the checkpointed plan.
        ocp2 = single_track_lane_ocp()
        ocp2.initial_controls = warm["controls"]
        result = make_solver("ilqr", PARAMS).solve(ocp2)
        assert int(result.iterations) <= 2  # warm start converges immediately


class TestFDParityMode:
    def test_fd_mode_solves_close_to_ad(self):
        """derivative_mode='fd' reproduces the reference's FD numerics and
        converges to the same optimum as exact AD."""
        ocp_fd = single_track_lane_ocp()
        ocp_fd.derivative_mode = "fd"
        ocp_fd.invalidate()
        ocp_fd.initialize_problem()
        r_fd = make_solver("ilqr", PARAMS).solve(ocp_fd)

        ocp_ad = single_track_lane_ocp()
        r_ad = make_solver("ilqr", PARAMS).solve(ocp_ad)
        np.testing.assert_allclose(float(r_fd.cost), float(r_ad.cost), rtol=1e-3)


class TestDebugLogging:
    def test_debug_flag_prints_iterations(self, capfd):
        ocp = single_track_lane_ocp()
        solver = make_solver("ilqr", {**PARAMS, "debug": 1})
        solver.solve(ocp)
        jax.effects_barrier()
        out = capfd.readouterr()
        assert "iLQR iter" in out.out or "iLQR iter" in out.err


class TestHeterogeneousAgents:
    def test_host_fallback_sequential(self):
        """Agents with different dims cannot stack; the host loop must still
        produce per-agent solutions."""

        def make_double_integrator(nx, nu, x0val):
            ocp = OCP(
                state_dim=nx, control_dim=nu, horizon_steps=8, dt=0.1,
                initial_state=jnp.full((nx,), x0val),
                dynamics=lambda x, u: jnp.concatenate(
                    [x[nx // 2:], jnp.zeros(nx - nx // 2 - nu), u]
                ) if nx > nu else u * 1.0,
                stage_cost=lambda x, u, t: jnp.sum(x**2) + 0.1 * jnp.sum(u**2),
            )
            ocp.initialize_problem()
            return ocp

        problem = MultiAgentProblem()
        problem.add_agent(Agent(0, make_double_integrator(2, 2, 1.0)))
        problem.add_agent(Agent(1, make_double_integrator(3, 3, 0.5)))

        solver = make_solver("ilqr")
        strategy = make_strategy("sequential", solver, PARAMS, 2)
        solution = solve_multi_agent(strategy, problem)
        assert len(solution.states) == 2
        assert solution.states[0].shape == (9, 2)
        assert solution.states[1].shape == (9, 3)
        assert solution.total_cost < 2.0 * (8 * (1.0 * 2) + 2)  # descended


class TestHostDeadline:
    """Opt-in max_ms enforcement (reference: ilqr.hpp:84-90)."""

    def test_slow_solve_returns_early_with_valid_result(self):
        from .problems import single_track_lane_ocp

        ocp = single_track_lane_ocp()
        solver = make_solver(
            "ilqr",
            {"max_iterations": 100000, "tolerance": 0.0,  # never converges
             "max_ms": 300.0, "enforce_max_ms": 1},
        )
        result = solver.solve(ocp)
        assert int(result.iterations) < 100000
        assert np.isfinite(float(result.cost))
        assert np.isfinite(np.asarray(result.controls)).all()

    def test_deadline_ignored_by_default(self):
        from .problems import lqr_ocp

        ocp = lqr_ocp()
        solver = make_solver(
            "ilqr", {"max_iterations": 50, "tolerance": 1e-9, "max_ms": 0.0001}
        )
        result = solver.solve(ocp)   # must NOT stop after 0.1 microseconds
        assert int(result.iterations) >= 2
