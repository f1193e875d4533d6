"""Closed-loop MPC driver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.mpc import mpc_step, run_mpc, shift_warm_start
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr

from .problems import single_track_lane_ocp

CONFIG = ILQRConfig(max_iterations=5, tolerance=1e-5)


def _solve(spec):
    return solve_ilqr(spec, CONFIG)


class TestMPC:
    def test_shift_warm_start(self):
        u = jnp.arange(6.0).reshape(3, 2)
        shifted = shift_warm_start(u)
        np.testing.assert_array_equal(np.array(shifted[:2]), np.array(u[1:]))
        np.testing.assert_array_equal(np.array(shifted[2]), np.array(u[2]))
        zeroed = shift_warm_start(u, fill="zero")
        np.testing.assert_array_equal(np.array(zeroed[2]), [0.0, 0.0])

    def test_closed_loop_regulates(self):
        """Lane-follow MPC drives the lateral error toward 0 and speed to 1."""
        spec = single_track_lane_ocp().spec()
        trace = jax.jit(lambda: run_mpc(spec, _solve, n_steps=60))()
        Y = np.array(trace.states[:, 1])
        V = np.array(trace.states[:, 3])
        assert abs(Y[0]) == 1.0
        assert abs(Y[-1]) < 0.1, f"lateral error {Y[-1]}"
        assert abs(V[-1] - 1.0) < 0.1, f"speed {V[-1]}"

    def test_warm_start_cuts_iterations(self):
        """After the transient, warm-started solves converge in ~1 iteration."""
        spec = single_track_lane_ocp().spec()
        trace = run_mpc(spec, _solve, n_steps=40)
        iters = np.array(trace.iterations)
        assert iters[0] >= 2
        assert iters[-10:].mean() <= 2.0

    def test_batched_closed_loop(self):
        """vmapped fleet simulation matches per-instance runs."""
        spec = single_track_lane_ocp().spec()
        y0 = jnp.array([0.5, 1.0, 1.5])
        x0s = jnp.tile(spec.initial_state, (3, 1)).at[:, 1].set(y0)

        fleet = jax.jit(
            jax.vmap(lambda x0: run_mpc(spec, _solve, n_steps=20, x0=x0))
        )(x0s)
        single = run_mpc(spec, _solve, n_steps=20, x0=x0s[1])
        np.testing.assert_allclose(
            np.array(fleet.states[1]), np.array(single.states), rtol=1e-6, atol=1e-8
        )

    def test_model_mismatch_plant(self):
        """MPC with a perturbed plant still regulates (feedback robustness)."""
        spec = single_track_lane_ocp().spec()

        def heavy_plant(x, u):
            base = spec.dynamics(x, u)
            return base.at[3].set(0.8 * base[3])  # 20% weaker acceleration

        trace = run_mpc(spec, _solve, n_steps=60, plant_dynamics=heavy_plant)
        Y = np.array(trace.states[:, 1])
        assert abs(Y[-1]) < 0.15


class TestRunMPCBatched:
    def test_matches_vmapped_run_mpc(self):
        """The fleet entry (one batched solve per step) equals vmap(run_mpc)
        when the batched solver is routed to the identical scan/XLA path."""
        from multi_agent_solver_tpu.mpc import run_mpc_batched
        from multi_agent_solver_tpu.solvers.ilqr import solve_ilqr_batched

        spec = single_track_lane_ocp().spec()
        y0 = jnp.array([0.5, 1.0, 1.5])
        x0s = jnp.tile(spec.initial_state, (3, 1)).at[:, 1].set(y0)
        specs = jax.vmap(lambda x0: spec.replace(initial_state=x0))(x0s)

        fleet = jax.jit(
            lambda: run_mpc_batched(
                specs,
                lambda s: solve_ilqr_batched(
                    s, CONFIG, backward="scan", fused=False
                ),
                n_steps=12,
            )
        )()
        ref = jax.jit(
            jax.vmap(lambda x0: run_mpc(spec, _solve, n_steps=12, x0=x0))
        )(x0s)
        # run_mpc_batched is step-major [N+1, B, nx]; vmap(run_mpc) is
        # batch-major [B, N+1, nx].
        np.testing.assert_allclose(
            np.array(fleet.states), np.array(ref.states).swapaxes(0, 1),
            rtol=1e-6, atol=1e-8,
        )
        np.testing.assert_allclose(
            np.array(fleet.costs), np.array(ref.costs).swapaxes(0, 1),
            rtol=1e-6, atol=1e-8,
        )


class TestRunMPCNash:
    def test_coupled_closed_loop_avoids_collision(self):
        """Receding-horizon Nash game: head-on traffic stays separated in
        CLOSED LOOP (the coupling only ever sees the current plans, so this
        exercises context refresh + warm-start shifting every step)."""
        from multi_agent_solver_tpu.mpc import run_mpc_nash
        from multi_agent_solver_tpu.solvers import make_solver
        from multi_agent_solver_tpu.strategies import make_strategy

        from .problems import head_on_fleet_problem

        def min_pairwise(states):  # [S, N, nx] -> scalar
            pos = states[..., :2]
            d = jnp.linalg.norm(pos[:, :, None] - pos[:, None], axis=-1)
            n = pos.shape[1]
            big = 1e9 * jnp.eye(n)
            return float(jnp.min(d + big[None]))

        params = {"max_iterations": 25, "tolerance": 1e-6, "max_ms": 1e9}
        n_steps = 16

        traces = {}
        for coupled in (False, True):
            problem = head_on_fleet_problem(4)
            if not coupled:
                problem.inter_agent_cost = None
            strategy = make_strategy("sequential", make_solver("ilqr"),
                                     params, max_outer=2)
            traces[coupled] = run_mpc_nash(problem, strategy, n_steps=n_steps)

        for coupled, trace in traces.items():
            assert trace.states.shape[0] == n_steps + 1
            assert np.all(np.isfinite(np.asarray(trace.states))), coupled

        d_coupled = min_pairwise(jnp.asarray(traces[True].states))
        d_uncoupled = min_pairwise(jnp.asarray(traces[False].states))
        # Uncoupled head-on traffic nearly collides mid-loop; the coupled
        # game never gets closer than the initial same-direction lane
        # spacing (0.3), i.e. the avoidance happens in closed loop.
        assert d_uncoupled < 0.15, d_uncoupled
        assert d_coupled > 0.29, d_coupled
