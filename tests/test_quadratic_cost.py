"""Quadratic-cost Hessian hoisting (``quadratic_cost=1``).

For quadratic costs the stage/terminal Hessian stacks are
trajectory-independent, so evaluating them once before the outer loop must
be bit-equivalent to re-deriving them every iteration -- on both the scalar
and the batched solver, with and without bounds/constraints.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.models import single_track_model
from multi_agent_solver_tpu.ocp import OCP
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQRConfig,
    solve_ilqr,
    solve_ilqr_batched,
)

# Explicit False pins the un-hoisted baseline path: since round 5 the
# DEFAULT (None) auto-detects this quadratic cost and would hoist too,
# making the comparison trivial.
CONFIG = ILQRConfig(max_iterations=12, tolerance=1e-9, quadratic_cost=False)


def _spec(bounded=False, constrained=False):
    kwargs = {}
    if bounded:
        kwargs.update(
            input_lower_bounds=jnp.array([-0.4, -1.0]),
            input_upper_bounds=jnp.array([0.4, 1.0]),
        )
    if constrained:
        kwargs.update(
            inequality_constraints=lambda x, u: jnp.array([u[1] ** 2 - 0.5]),
        )
    ocp = OCP(
        state_dim=4, control_dim=2, horizon_steps=40, dt=0.1,
        initial_state=jnp.array([0.0, 1.0, 0.0, 0.5], jnp.float64),
        dynamics=single_track_model,
        stage_cost=lambda x, u, t: x[1] ** 2 + (x[3] - 1.0) ** 2
        + 0.1 * (u[0] ** 2 + u[1] ** 2),
        terminal_cost=lambda x: 2.0 * x[1] ** 2,
        **kwargs,
    )
    ocp.initialize_problem()
    return ocp.spec()


class TestQuadraticCostHoisting:
    def test_scalar_solver_bit_equal(self):
        spec = _spec()
        base = jax.jit(solve_ilqr, static_argnums=1)(spec, CONFIG)
        hoist = jax.jit(solve_ilqr, static_argnums=1)(
            spec, dataclasses.replace(CONFIG, quadratic_cost=True)
        )
        np.testing.assert_array_equal(np.asarray(base.controls),
                                      np.asarray(hoist.controls))
        np.testing.assert_array_equal(float(base.cost), float(hoist.cost))

    def test_scalar_solver_constrained_bit_equal(self):
        spec = _spec(bounded=True, constrained=True)
        base = jax.jit(solve_ilqr, static_argnums=1)(spec, CONFIG)
        hoist = jax.jit(solve_ilqr, static_argnums=1)(
            spec, dataclasses.replace(CONFIG, quadratic_cost=True)
        )
        np.testing.assert_array_equal(np.asarray(base.controls),
                                      np.asarray(hoist.controls))

    def test_batched_solver_matches(self):
        spec = _spec()
        x0s = jnp.stack([
            spec.initial_state,
            spec.initial_state.at[1].set(-0.7),
            spec.initial_state.at[3].set(0.1),
        ])
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0s)
        # Pin the kernel-per-phase path: hoisting targets it (the fused
        # lane-resident path recomputes in-kernel and ignores the flag).
        run = jax.jit(
            lambda s, c: solve_ilqr_batched(s, c, fused=False),
            static_argnums=1,
        )
        base = run(specs, CONFIG)
        hoist = run(specs, dataclasses.replace(CONFIG, quadratic_cost=True))
        np.testing.assert_allclose(np.asarray(hoist.cost),
                                   np.asarray(base.cost), rtol=1e-12)

    def test_param_key_accepted(self):
        from multi_agent_solver_tpu import make_solver

        solver = make_solver("ilqr")
        solver.set_params({"max_iterations": 5, "tolerance": 1e-6,
                           "max_ms": 1e9, "quadratic_cost": 1})
        assert solver.config.quadratic_cost is True

    def test_param_key_absent_is_auto(self):
        from multi_agent_solver_tpu import make_solver

        solver = make_solver("ilqr")
        solver.set_params({"max_iterations": 5, "tolerance": 1e-6,
                           "max_ms": 1e9})
        assert solver.config.quadratic_cost is None
        assert solver.config.stationary_cost is None


class TestCostStructureProbe:
    """Trace-time Hessian probe (round 5, VERDICT r4 item 3)."""

    def test_detects_quadratic_stationary(self):
        from multi_agent_solver_tpu.solvers.ilqr import probe_cost_structure

        assert probe_cost_structure(_spec()) == (True, True)

    def test_detects_time_varying_quadratic(self):
        from multi_agent_solver_tpu.solvers.ilqr import probe_cost_structure

        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=40, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5]),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: (1.0 + 0.1 * t) * x[1] ** 2
            + 0.1 * (u[0] ** 2 + u[1] ** 2),
            terminal_cost=lambda x: 2.0 * x[1] ** 2,
        )
        ocp.initialize_problem()
        assert probe_cost_structure(ocp.spec()) == (True, False)

    def test_detects_non_quadratic(self):
        from multi_agent_solver_tpu.solvers.ilqr import probe_cost_structure

        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=40, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5]),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: jnp.cos(x[1]) + 0.1 * u[0] ** 4
            + 0.1 * u[1] ** 2,
            terminal_cost=lambda x: 2.0 * x[1] ** 2,
        )
        ocp.initialize_problem()
        assert probe_cost_structure(ocp.spec()) == (False, False)

    def test_wrong_assertion_raises(self):
        """A non-quadratic cost with quadratic_cost=1 set must raise, not
        silently return a fixed-metric Gauss-Newton answer."""
        import pytest

        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=20, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5]),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: jnp.cos(x[1])
            + 0.1 * (u[0] ** 2 + u[1] ** 2),
            terminal_cost=lambda x: 2.0 * x[1] ** 2,
        )
        ocp.initialize_problem()
        cfg = dataclasses.replace(CONFIG, quadratic_cost=True)
        with pytest.raises(ValueError, match="not quadratic"):
            solve_ilqr(ocp.spec(), cfg)

    def test_wrong_stationary_assertion_raises(self):
        import pytest

        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=20, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5]),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: (1.0 + 0.1 * t) * x[1] ** 2
            + 0.1 * (u[0] ** 2 + u[1] ** 2),
            terminal_cost=lambda x: 2.0 * x[1] ** 2,
        )
        ocp.initialize_problem()
        cfg = dataclasses.replace(
            CONFIG, quadratic_cost=True, stationary_cost=True
        )
        with pytest.raises(ValueError, match="t=0 and"):
            solve_ilqr(ocp.spec(), cfg)

    def test_auto_default_matches_explicit_off(self):
        """The default (auto) path on a quadratic cost hoists and must match
        the explicit-off path bit-for-bit."""
        spec = _spec()
        auto = jax.jit(solve_ilqr, static_argnums=1)(
            spec, ILQRConfig(max_iterations=12, tolerance=1e-9)
        )
        off = jax.jit(solve_ilqr, static_argnums=1)(spec, CONFIG)
        np.testing.assert_array_equal(np.asarray(auto.controls),
                                      np.asarray(off.controls))

    def test_auto_on_non_quadratic_cost_is_safe(self):
        """Auto-detection on a non-quadratic cost must keep per-iteration
        Hessians (same answer as explicit off)."""
        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=20, dt=0.1,
            initial_state=jnp.array([0.0, 1.0, 0.0, 0.5]),
            dynamics=single_track_model,
            stage_cost=lambda x, u, t: jnp.cos(x[1])
            + 0.1 * (u[0] ** 2 + u[1] ** 2),
            terminal_cost=lambda x: 2.0 * x[1] ** 2,
        )
        ocp.initialize_problem()
        spec = ocp.spec()
        auto = jax.jit(solve_ilqr, static_argnums=1)(
            spec, ILQRConfig(max_iterations=12, tolerance=1e-9)
        )
        off = jax.jit(solve_ilqr, static_argnums=1)(spec, CONFIG)
        np.testing.assert_array_equal(np.asarray(auto.controls),
                                      np.asarray(off.controls))
