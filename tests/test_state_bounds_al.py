"""State bounds through the AL machinery (``state_bounds_al=1``).

The reference enforces state bounds only in its QP solvers; iLQR and CGD
silently ignore them (rocket_max_altitude.cpp:122-128).  The
``with_state_bound_constraints`` transform folds finite bound entries into
PHR inequality rows so the AL solvers honor them too.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from multi_agent_solver_tpu.ocp import OCP, with_state_bound_constraints
from multi_agent_solver_tpu.solvers.cgd import CGD
from multi_agent_solver_tpu.solvers.ilqr import ILQR, ILQRConfig, solve_ilqr

INF = float("inf")


def _double_integrator(x_max: float) -> OCP:
    """1-D double integrator pushed toward x = 2 with a position cap."""
    ocp = OCP(
        state_dim=2, control_dim=1, horizon_steps=30, dt=0.1,
        initial_state=jnp.array([0.0, 0.0]),
        dynamics=lambda x, u: jnp.array([x[1], u[0]]),
        stage_cost=lambda x, u, t: (x[0] - 2.0) ** 2 + 1e-3 * u[0] ** 2,
        state_upper_bounds=jnp.array([x_max, INF]),
        state_lower_bounds=jnp.array([-INF, -INF]),
    )
    ocp.initialize_problem()
    return ocp


class TestStateBoundsAL:
    def test_transform_shapes_and_values(self):
        spec = _double_integrator(1.0).spec()
        bounded = with_state_bound_constraints(spec)
        # Only the finite row (x0 <= 1) becomes a constraint.
        assert bounded.ineq_dim == 1
        g = bounded.inequality_constraints(
            jnp.array([1.5, 7.0]), jnp.array([0.0])
        )
        np.testing.assert_allclose(np.asarray(g), [0.5])
        gx = bounded.derivs.ineq_gx(jnp.array([1.5, 7.0]), jnp.array([0.0]))
        np.testing.assert_allclose(np.asarray(gx), [[1.0, 0.0]])

    def test_no_finite_bounds_is_identity(self):
        ocp = _double_integrator(1.0)
        ocp.state_upper_bounds = jnp.array([INF, INF])
        spec = ocp.spec()
        assert with_state_bound_constraints(spec) is spec

    def test_ilqr_honors_position_cap(self):
        ocp = _double_integrator(1.0)
        config = dict(max_iterations=80, tolerance=1e-8, max_ms=1e9)

        # Reference behaviour: bounds ignored, trajectory reaches ~2.
        plain = ILQR()
        plain.set_params(config)
        plain.solve(ocp)
        assert float(np.max(np.asarray(ocp.best_states)[:, 0])) > 1.5

        bounded = ILQR()
        bounded.set_params({**config, "state_bounds_al": 1})
        result = bounded.solve(ocp)
        peak = float(np.max(np.asarray(ocp.best_states)[:, 0]))
        assert peak < 1.02, peak
        assert float(result.ineq_violation) < 1e-2

    def test_cgd_honors_position_cap(self):
        ocp = _double_integrator(1.0)
        solver = CGD()
        solver.set_params({"max_iterations": 150, "tolerance": 1e-9,
                           "max_ms": 1e9, "state_bounds_al": 1})
        solver.solve(ocp)
        peak = float(np.max(np.asarray(ocp.best_states)[:, 0]))
        assert peak < 1.05, peak

    def test_transform_composes_with_existing_constraints(self):
        ocp = _double_integrator(1.0)
        ocp.inequality_constraints = lambda x, u: jnp.stack([u[0] - 5.0])
        ocp.initialize_problem()
        spec = with_state_bound_constraints(ocp.spec())
        assert spec.ineq_dim == 2
        g = spec.inequality_constraints(jnp.array([1.5, 0.0]), jnp.array([6.0]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.5])
