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

    def test_short_ladder_matches_reference_ladder(self):
        """bench.py's short forward-pass ladder (1, 1/2, 1/8) must reproduce
        the reference 10-rung ladder's answers on the headline problem --
        every lane accepts alpha in {1, 1/2}, so pruning the tail rungs
        changes nothing but device time (docs/BENCHMARKS.md)."""
        specs = _specs(8)
        config_ref = ILQRConfig(max_iterations=10, tolerance=1e-5)
        config_short = ILQRConfig(max_iterations=10, tolerance=1e-5,
                                  alpha_ladder=(1.0, 0.5, 0.125))
        ref = solve_ilqr_batched(specs, config_ref)
        short = solve_ilqr_batched(specs, config_short)
        np.testing.assert_allclose(
            np.asarray(short.cost), np.asarray(ref.cost), rtol=1e-6
        )
        # The scheduled variant (full ladder for 2 warmup iterations, short
        # after) must also agree.
        config_sched = ILQRConfig(max_iterations=10, tolerance=1e-5,
                                  alpha_ladder=(1.0, 0.5, 0.125),
                                  alpha_warmup=2)
        sched = solve_ilqr_batched(specs, config_sched)
        np.testing.assert_allclose(
            np.asarray(sched.cost), np.asarray(ref.cost), rtol=1e-6
        )

    def test_lane_fold_is_bit_exact(self):
        """The lane fold (ILQRConfig.lane_fold) packs F batch tiles into the
        sublane axis of every fused-kernel block -- a pure relabeling of
        which (sublane, lane) coordinate a problem occupies, so results must
        be BIT-identical to the unfolded layout, fold for fold."""
        spec = single_track_lane_ocp().spec()
        B = 2048                               # 2 tiles: folds 1 and 2 differ
        y = jnp.linspace(0.4, 2.2, B)
        x0s = jnp.tile(spec.initial_state, (B, 1)).at[:, 1].set(y)
        specs = jax.vmap(lambda x0: spec.replace(initial_state=x0))(x0s)
        config = lambda f: ILQRConfig(max_iterations=4, tolerance=1e-5,
                                      alpha_ladder=(1.0, 0.5, 0.125),
                                      lane_fold=f)
        base = solve_ilqr_batched(specs, config(1))
        for fold in (2, 0):                    # explicit fold and auto
            other = solve_ilqr_batched(specs, config(fold))
            np.testing.assert_array_equal(
                np.asarray(base.cost), np.asarray(other.cost)
            )
            np.testing.assert_array_equal(
                np.asarray(base.controls), np.asarray(other.controls)
            )

    def test_quadratic_cost_hoisting_is_bit_exact(self):
        """quadratic_cost on the fused path hoists the Hessian stacks out of
        the iteration loop (the linearize kernel runs hessians=False); for a
        genuinely quadratic cost this is a pure strength reduction, so the
        results must be BIT-identical to the per-iteration path."""
        specs = _specs(6)
        base = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5)
        )
        quad = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5,
                              quadratic_cost=True)
        )
        np.testing.assert_array_equal(
            np.asarray(base.cost), np.asarray(quad.cost)
        )
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(quad.controls)
        )

    def test_stationary_cost_is_bit_exact(self):
        """stationary_cost additionally collapses the Hessian stacks to one
        block per problem (the Riccati kernel reads it once per batch row,
        hess_tconst).  The lane-follow weights are fixed, so this too must
        be bit-identical."""
        specs = _specs(6)
        base = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5)
        )
        stat = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5,
                              quadratic_cost=True, stationary_cost=True)
        )
        np.testing.assert_array_equal(
            np.asarray(base.cost), np.asarray(stat.cost)
        )
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(stat.controls)
        )
        # The separate-kernel stationary implementation (hess_tconst blocks
        # instead of in-kernel linearization) must agree too.
        tconst = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5,
                              quadratic_cost=True, stationary_cost=True,
                              stationary_fusedlin=False)
        )
        np.testing.assert_array_equal(
            np.asarray(base.cost), np.asarray(tconst.cost)
        )

    def test_fixed_trip_loop_matches_while_loop(self):
        """early_exit=False swaps the data-dependent while_loop for a fixed
        fori_loop to max_iterations; per-lane freeze masks are identical, so
        trajectories and costs must be bit-identical (only the reported
        iteration counter may differ: extra all-frozen no-op iterations)."""
        specs = _specs(6)
        base = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=8, tolerance=1e-5)
        )
        fixed = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=8, tolerance=1e-5,
                              early_exit=False)
        )
        np.testing.assert_array_equal(
            np.asarray(base.cost), np.asarray(fixed.cost)
        )
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(fixed.controls)
        )
        # Tight tolerance forces early convergence of every lane: the fixed
        # loop's trailing no-op iterations must not perturb anything.
        cfg_tight = lambda ee: ILQRConfig(max_iterations=30, tolerance=1e2,
                                          early_exit=ee)
        b2 = solve_ilqr_batched(specs, cfg_tight(True))
        f2 = solve_ilqr_batched(specs, cfg_tight(False))
        np.testing.assert_array_equal(
            np.asarray(b2.controls), np.asarray(f2.controls)
        )

    def test_time_varying_quadratic_cost_keeps_per_stage_stacks(self):
        """A quadratic cost with TIME-VARYING weights exercises the [T]-stack
        hoisting branch (stationary_cost would be an invalid assertion
        here, quadratic_cost alone is valid): hoisted Hessians must still
        be per-stage and match the non-hoisted fused path exactly."""
        from .problems import single_track_lane_ocp

        w = lambda t: 1.0 + 0.05 * t

        def stage_cost(x, u, t):
            return (
                10.0 * w(t) * x[1] ** 2
                + (x[3] - 1.0) ** 2
                + 0.1 * (u[0] ** 2 + u[1] ** 2)
            )

        spec = single_track_lane_ocp(stage_cost=stage_cost).spec()
        B = 4
        y = jnp.linspace(0.4, 2.0, B)
        x0s = jnp.tile(spec.initial_state, (B, 1)).at[:, 1].set(y)
        specs = jax.vmap(lambda x0: spec.replace(initial_state=x0))(x0s)
        base = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5)
        )
        quad = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5,
                              quadratic_cost=True)
        )
        np.testing.assert_array_equal(
            np.asarray(base.cost), np.asarray(quad.cost)
        )
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(quad.controls)
        )

    def test_boxqp_stationary_matches(self):
        """The in-kernel-linearize Riccati (stationary path) also carries the
        box-QP stage solves.  Unlike the unconstrained branch (bit-exact
        above), the box-QP active-set selection takes EXACT KKT comparisons
        (ops/riccati_pallas._boxqp_lane_gains), so a last-ulp fusion
        difference between the two compiled kernels can flip a boundary-tied
        configuration -- observed as ~1e-6 gain differences from one stage
        onward.  Equality is therefore asserted to tight tolerances, not
        bitwise."""
        specs = _specs(4)
        base = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5,
                              bound_mode="boxqp")
        )
        stat = solve_ilqr_batched(
            specs, ILQRConfig(max_iterations=6, tolerance=1e-5,
                              bound_mode="boxqp", quadratic_cost=True,
                              stationary_cost=True)
        )
        np.testing.assert_allclose(
            np.asarray(base.cost), np.asarray(stat.cost), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(base.controls), np.asarray(stat.controls), atol=1e-4
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


class TestEmitLin:
    def test_select_emitted_linearization_matches_linearize_kernel(self):
        """The select kernel's phase-2 emit_lin stacks equal the standalone
        lane linearizer on the accepted trajectory (alpha = 0 re-roll)."""
        from multi_agent_solver_tpu.ops.forward_select_pallas import (
            _to_lanes, forward_select_pallas_tiled,
        )
        from multi_agent_solver_tpu.ops.linearize_pallas import (
            linearize_pallas_tiled,
        )

        spec = single_track_lane_ocp().spec()
        T, nx, nu = spec.horizon_steps, 4, 2
        B = 1024   # one lane tile
        rng = np.random.RandomState(0)
        us = jnp.asarray(rng.uniform(-0.2, 0.2, (B, T, nu)), jnp.float32)
        x0 = jnp.tile(spec.initial_state, (B, 1)).astype(jnp.float32)
        x0_l = _to_lanes(x0, B)
        us_l = _to_lanes(us, B)
        x0_bc = jnp.broadcast_to(x0_l[:, None], (1, T, nx, 8, 128))
        zk = jnp.zeros((1, T, nu, 8, 128), jnp.float32)
        zK = jnp.zeros((1, T, nu, nx, 8, 128), jnp.float32)
        inf = jnp.full((1, 8, 128), jnp.inf, jnp.float32)
        zb = jnp.zeros((1, nu, 8, 128), jnp.float32)
        plain = spec.replace(input_lower_bounds=None, input_upper_bounds=None)

        xs_tail, us_out, _, _, *lin_emit = forward_select_pallas_tiled(
            plain, x0_bc, us_l, zk, zK, inf, zb, zb, (0.0,), True,
            emit_lin=True, lin_discrete=True,
        )
        xs_stage = jnp.concatenate([x0_l[:, None], xs_tail[:, :-1]], axis=1)
        lin_ref = linearize_pallas_tiled(plain, xs_stage, us_l, True, True)
        for got, want in zip(lin_emit, lin_ref):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
            )


class TestFusedContext:
    def test_coupled_solve_fused_matches_regular_short_horizon(self):
        """Explicit fused=True supports context costs; within a few
        iterations it tracks the f64-glue path closely (full nonconvex
        coupled solves may then drift to different-but-valid optima)."""
        from tests.test_coupling import _head_on_problem, PARAMS
        from multi_agent_solver_tpu import make_solver, make_strategy
        from multi_agent_solver_tpu.strategies.base import stack_agent_specs
        import dataclasses

        problem = _head_on_problem(coupled=True)
        problem.compute_offsets()
        strategy = make_strategy("sequential", make_solver("ilqr"), PARAMS, 2)
        specs = strategy._prepare(problem, stack_agent_specs(problem))
        xs0 = jax.vmap(lambda s: s.rollout(s.initial_controls))(specs)
        run = strategy._sweep_specs(specs, specs.initial_controls, xs0)
        config = dataclasses.replace(strategy._config, max_iterations=3)
        fused = solve_ilqr_batched(run, config, fused=True)
        regular = solve_ilqr_batched(run, config, fused=False)
        np.testing.assert_allclose(
            np.asarray(fused.cost), np.asarray(regular.cost), rtol=1e-3
        )

    def test_auto_keeps_coupled_on_regular_path(self):
        """fused='auto' must NOT engage for context solves (equilibrium
        sensitivity, see solve_ilqr_batched); results equal fused=False."""
        from tests.test_coupling import _head_on_problem, PARAMS
        from multi_agent_solver_tpu import make_solver, make_strategy
        from multi_agent_solver_tpu.strategies.base import stack_agent_specs

        problem = _head_on_problem(coupled=True)
        problem.compute_offsets()
        strategy = make_strategy("sequential", make_solver("ilqr"), PARAMS, 2)
        specs = strategy._prepare(problem, stack_agent_specs(problem))
        xs0 = jax.vmap(lambda s: s.rollout(s.initial_controls))(specs)
        run = strategy._sweep_specs(specs, specs.initial_controls, xs0)
        auto = solve_ilqr_batched(run, strategy._config)
        regular = solve_ilqr_batched(run, strategy._config, fused=False)
        np.testing.assert_array_equal(np.asarray(auto.cost),
                                      np.asarray(regular.cost))


class TestFusedConstrained:
    def _constrained_specs(self):
        from multi_agent_solver_tpu.ocp import OCP
        from multi_agent_solver_tpu.models import single_track_model

        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=40, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5], jnp.float64),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: x[1] ** 2 + (x[3] - 1.0) ** 2
            + 0.1 * (u[0] ** 2 + u[1] ** 2),
            input_lower_bounds=jnp.array([-0.5, -1.0]),
            input_upper_bounds=jnp.array([0.5, 1.0]),
            inequality_constraints=lambda x, u: jnp.array([x[3] - 0.8]),
        )
        ocp.initialize_problem()
        spec = ocp.spec()
        return jax.vmap(
            lambda y: spec.replace(initial_state=spec.initial_state.at[1].set(y))
        )(jnp.array([0.5, 1.0, 1.5]))

    def test_al_fused_matches_regular(self):
        """Lane-space AL (merit, fold, dual updates) tracks the regular
        batched path to f32 precision over a meaningful iteration budget.
        (Long runs under the x5 penalty schedule reach rho ~ 1e13 where the
        final feasibility step is chaotic in BOTH paths -- hence the
        explicit-opt-in policy for AL on the fused loop.)"""
        specs = self._constrained_specs()
        config = ILQRConfig(max_iterations=8, tolerance=1e-8)
        fused = solve_ilqr_batched(specs, config, fused=True)
        regular = solve_ilqr_batched(specs, config, fused=False)
        np.testing.assert_allclose(
            np.asarray(fused.cost), np.asarray(regular.cost), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(fused.ineq_violation),
            np.asarray(regular.ineq_violation), atol=1e-4
        )

    def test_al_fused_satisfies_constraint_at_convergence(self):
        specs = self._constrained_specs()
        config = ILQRConfig(max_iterations=40, tolerance=1e-8)
        r = solve_ilqr_batched(specs, config, fused=True)
        assert np.asarray(r.converged).all()
        v = np.asarray(r.states[:, :, 3])
        assert (v <= 0.8 + 1e-3).all(), f"max speed {v.max()}"

    def test_auto_keeps_constrained_on_regular_path(self):
        specs = self._constrained_specs()
        config = ILQRConfig(max_iterations=6, tolerance=1e-8)
        auto = solve_ilqr_batched(specs, config)
        regular = solve_ilqr_batched(specs, config, fused=False)
        np.testing.assert_array_equal(np.asarray(auto.cost),
                                      np.asarray(regular.cost))
