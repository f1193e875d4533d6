"""Cross-solve QP workspace persistence (reference: osqp.hpp:90-110).

The reference keeps its OSQP workspace alive on the solver object, so
repeated ``solve()`` calls (MPC shifts, Nash sweeps) warm-start the QP's
primal/dual iterates.  Our analogue stores the final ADMM state per solver
instance and threads it into the next same-shaped solve.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_agent_solver_tpu import OCP, make_solver
from multi_agent_solver_tpu.models import single_track_model


def _make_ocp(T=30, x0=(0.0, 1.0, 0.0, 0.5)):
    ocp = OCP(
        state_dim=4, control_dim=2, horizon_steps=T, dt=0.1,
        initial_state=jnp.asarray(x0, jnp.float64),
        dynamics=single_track_model,
        stage_cost=lambda x, u, t: x[1] ** 2 + (x[3] - 1.0) ** 2
        + 0.1 * (u[0] ** 2 + u[1] ** 2),
        input_lower_bounds=jnp.array([-0.5, -1.0]),
        input_upper_bounds=jnp.array([0.5, 1.0]),
    )
    ocp.initialize_problem()
    return ocp


@pytest.mark.parametrize("name", ["osqp", "osqp_collocation"])
class TestPersistentWorkspace:
    def test_repeat_solve_uses_and_preserves_answer(self, name):
        solver = make_solver(name)
        solver.set_params({"max_iterations": 10, "tolerance": 1e-6,
                           "max_ms": 1e9, "step_limit": 5.0})
        ocp = _make_ocp()
        r1 = solver.solve(ocp)
        assert solver._qp_state is not None          # workspace captured
        r2 = solver.solve(ocp)
        # Warm-started repeat of an identical problem: same answer.
        np.testing.assert_allclose(float(r2.cost), float(r1.cost), rtol=1e-6)
        # Both the cold and the warm jit variants were exercised.
        variants = {k[1] for k in solver._jitted}
        assert variants == {True, False}

    def test_mpc_shift_pattern(self, name):
        """Warm-started receding-horizon resolves stay valid as x0 moves."""
        solver = make_solver(name)
        solver.set_params({"max_iterations": 8, "tolerance": 1e-6,
                           "max_ms": 1e9, "step_limit": 5.0})
        ocp = _make_ocp()
        costs = []
        for _ in range(3):
            r = solver.solve(ocp)
            costs.append(float(r.cost))
            # Shift: advance the initial state one step along the plan.
            ocp.initial_state = jnp.asarray(r.states[1])
            ocp.initial_controls = jnp.concatenate(
                [r.controls[1:], r.controls[-1:]]
            )
        assert all(np.isfinite(c) for c in costs)
        # Progress along an improving plan should not blow the cost up.
        assert costs[-1] <= costs[0] * 1.5 + 1.0

    def test_shape_change_resets_workspace(self, name):
        solver = make_solver(name)
        solver.set_params({"max_iterations": 5, "tolerance": 1e-6,
                           "max_ms": 1e9, "step_limit": 5.0})
        r1 = solver.solve(_make_ocp(T=20))
        sig1 = solver._qp_state[0]
        r2 = solver.solve(_make_ocp(T=25))           # different horizon
        sig2 = solver._qp_state[0]
        assert sig1 != sig2
        assert np.isfinite(float(r1.cost)) and np.isfinite(float(r2.cost))

    def test_set_params_resets_workspace(self, name):
        solver = make_solver(name)
        solver.set_params({"max_iterations": 5, "tolerance": 1e-6,
                           "max_ms": 1e9, "step_limit": 5.0})
        solver.solve(_make_ocp())
        assert solver._qp_state is not None
        solver.set_params({"max_iterations": 6, "tolerance": 1e-6,
                           "max_ms": 1e9, "step_limit": 5.0})
        assert solver._qp_state is None
