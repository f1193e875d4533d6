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

CONFIG = ILQRConfig(max_iterations=12, tolerance=1e-9)


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
