"""Augmented-Lagrangian path-constraint tests for iLQR and CGD.

The reference handles per-stage equality/inequality constraints through AL
terms (ilqr.hpp:121-169, 239-260; cgd.hpp via constraint_helpers.hpp); these
tests exercise those code paths functionally.
"""

import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu import OCP, make_solver
from multi_agent_solver_tpu.constraints import (
    compute_augmented_cost,
    update_lagrange_multipliers,
    violation_norms,
)
from multi_agent_solver_tpu.models import single_track_model


def _speed_limited_ocp(vmax=0.6, **params):
    """Lane follow with an inequality speed cap v <= vmax (active at the
    unconstrained optimum where v -> 1)."""
    ocp = OCP(
        state_dim=4, control_dim=2, horizon_steps=40, dt=0.1,
        initial_state=jnp.array([0.0, 1.0, 0.0, 0.0]),
        dynamics=single_track_model,
        stage_cost=lambda x, u, t: 10.0 * x[1] ** 2 + (x[3] - 1.0) ** 2
        + 0.1 * (u[0] ** 2 + u[1] ** 2),
        inequality_constraints=lambda x, u: jnp.array([x[3] - vmax]),
        input_lower_bounds=jnp.array([-0.7, -1.0]),
        input_upper_bounds=jnp.array([0.7, 1.0]),
        **params,
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


def _equality_ocp():
    """Pin the acceleration input to 0.3 via a per-stage equality constraint
    (feasible at every stage, unlike a state equality at the fixed x_0)."""
    ocp = OCP(
        state_dim=4, control_dim=2, horizon_steps=30, dt=0.1,
        initial_state=jnp.array([0.0, 0.5, 0.3, 0.5]),
        dynamics=single_track_model,
        stage_cost=lambda x, u, t: x[1] ** 2 + 0.1 * (u[0] ** 2 + u[1] ** 2),
        equality_constraints=lambda x, u: jnp.array([u[1] - 0.3]),
    )
    ocp.initialize_problem()
    return ocp


class TestILQRConstraints:
    def test_inequality_speed_cap_enforced(self):
        ocp = _speed_limited_ocp()
        result = make_solver(
            "ilqr",
            {"max_iterations": 60, "tolerance": 1e-7, "max_ms": 1e9,
             "constraint_tolerance": 1e-3},
        ).solve(ocp)
        V = np.array(result.states)[:, 3]
        assert V.max() <= 0.6 + 5e-2, f"vmax violated: {V.max()}"
        assert float(result.ineq_violation) < 1e-2
        # Unconstrained solve exceeds the cap (sanity that it binds).
        ocp_free = _speed_limited_ocp()
        ocp_free.inequality_constraints = None
        ocp_free.invalidate()
        ocp_free.initialize_problem()
        r_free = make_solver(
            "ilqr", {"max_iterations": 60, "tolerance": 1e-7, "max_ms": 1e9}
        ).solve(ocp_free)
        assert np.array(r_free.states)[:, 3].max() > 0.8

    def test_equality_constraint_drives_residual_down(self):
        ocp = _equality_ocp()
        result = make_solver(
            "ilqr",
            {"max_iterations": 80, "tolerance": 1e-8, "max_ms": 1e9,
             "constraint_tolerance": 1e-3, "penalty": 10.0},
        ).solve(ocp)
        accel = np.array(result.controls)[:, 1]
        assert float(np.abs(accel - 0.3).max()) < 0.02, accel[:6]
        assert float(result.eq_violation) < 0.02

    def test_merit_decreases_with_constraints(self):
        ocp = _speed_limited_ocp()
        result = make_solver(
            "ilqr", {"max_iterations": 25, "tolerance": 1e-9, "max_ms": 1e9}
        ).solve(ocp)
        assert np.isfinite(float(result.merit))
        assert float(result.cost) > 0


class TestBatchedConstrained:
    def test_batched_al_kernel_matches_vmap(self):
        """The fused forward kernel's in-kernel AL merit terms must agree
        with the per-problem XLA path."""
        import jax

        from multi_agent_solver_tpu.solvers.ilqr import (
            ILQRConfig, solve_ilqr, solve_ilqr_batched,
        )

        spec = _speed_limited_ocp().spec()
        # Force f32 leaves so both paths use identical arithmetic (the fused
        # kernels are f32; f64 runs legitimately land in different accepts on
        # this constraint-sensitive problem).
        spec = jax.tree_util.tree_map(lambda l: l.astype(jnp.float32), spec)
        config = ILQRConfig(max_iterations=40, tolerance=1e-7,
                            constraint_tolerance=1e-3)
        ys = jnp.array([0.5, 1.0, 1.5], jnp.float32)
        specs = jax.vmap(
            lambda y: spec.replace(initial_state=spec.initial_state.at[1].set(y))
        )(ys)

        # Per-iteration agreement of the fused-kernel path against the XLA
        # forward path (identical f32 arithmetic): the AL merit terms agree
        # to float rounding.  (Long runs on this problem amplify f32
        # summation-order noise chaotically, so compare early iterations.)
        short = ILQRConfig(max_iterations=8, tolerance=1e-9,
                           constraint_tolerance=1e-9)
        with_kernel = jax.jit(lambda s: solve_ilqr_batched(s, short))(specs)
        xla_path = jax.jit(
            lambda s: solve_ilqr_batched(s, short, backward="scan")
        )(specs)
        np.testing.assert_allclose(
            np.array(with_kernel.merit), np.array(xla_path.merit), rtol=1e-5
        )
        # And the full constrained solve still enforces the cap on the fast path.
        full = jax.jit(lambda s: solve_ilqr_batched(s, config))(specs)
        V = np.array(full.states)[:, :, 3]
        assert V.max() <= 0.6 + 0.05, f"vmax violated in batched path: {V.max()}"


class TestCGDConstraints:
    def test_inequality_speed_cap_enforced(self):
        ocp = _speed_limited_ocp()
        result = make_solver(
            "cgd", {"max_iterations": 150, "tolerance": 1e-9, "max_ms": 1e9}
        ).solve(ocp)
        V = np.array(result.states)[:, 3]
        assert V.max() <= 0.6 + 0.1, f"vmax violated: {V.max()}"


class TestALHelpers:
    def test_multiplier_update_rules(self):
        """lambda_eq += rho g; lambda_ineq = max(0, lambda + rho g)
        (constraint_helpers.hpp:60-73)."""
        ocp = _speed_limited_ocp()
        spec = ocp.spec()
        X = spec.rollout(spec.initial_controls)
        U = spec.initial_controls
        ineq0 = jnp.ones((40, 1)) * 0.2
        _, ineq1 = update_lagrange_multipliers(spec, X, U, None, ineq0, jnp.asarray(2.0))
        h = np.array(
            jnp.stack([spec.inequality_constraints(X[t], U[t]) for t in range(40)])
        )
        want = np.maximum(0.2 + 2.0 * h, 0.0)
        np.testing.assert_allclose(np.array(ineq1), want, rtol=1e-6)

    def test_phr_augmented_cost_formula(self):
        """(1/2rho)(||max(0, l + rho g)||^2 - ||l||^2)
        (constraint_helpers.hpp:38-43)."""
        ocp = _speed_limited_ocp()
        spec = ocp.spec()
        X = spec.rollout(spec.initial_controls)
        U = spec.initial_controls
        lam = jnp.full((40, 1), 0.3)
        rho = jnp.asarray(4.0)
        total = compute_augmented_cost(spec, X, U, None, lam, rho)
        base = spec.cost(X, U)
        h = np.array(
            jnp.stack([spec.inequality_constraints(X[t], U[t]) for t in range(40)])
        )
        phr = (0.5 / 4.0) * (np.maximum(0.3 + 4.0 * h, 0.0) ** 2 - 0.3**2).sum()
        np.testing.assert_allclose(float(total), float(base) + phr, rtol=1e-6)

    def test_violation_norms(self):
        ocp = _speed_limited_ocp()
        spec = ocp.spec()
        X = spec.rollout(spec.initial_controls)
        eqn, ineqn = violation_norms(spec, X, spec.initial_controls)
        assert float(eqn) == 0.0
        assert float(ineqn) >= 0.0
