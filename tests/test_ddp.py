"""Full second-order DDP (``ddp=1``): exact dynamics-Hessian terms.

The reference (and default) iLQR is the Gauss-Newton variant that drops the
``V_x . F_xx`` curvature of the dynamics (ilqr.hpp:115-119).  ``ddp=1`` adds
the exact second-order terms of the discrete RK4 step map.

Checks:
* on affine dynamics (LQR) the Hessians vanish and DDP == iLQR bit-exactly;
* on a one-stage problem the DDP gains match the true Newton step of the
  Q-function ``Q(x, u) = l(x, u) + V(f(x, u))`` computed by ``jax.hessian``
  (and Gauss-Newton's do NOT);
* on the nonlinear pendulum DDP converges and matches iLQR's optimum.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.integrators import integrate_rk4
from multi_agent_solver_tpu.ocp import OCP
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQR,
    ILQRConfig,
    solve_ilqr,
    solve_ilqr_batched,
)

from .problems import lqr_ocp


class TestDDP:
    def test_lqr_identical_to_ilqr(self):
        spec = lqr_ocp().spec()
        config = ILQRConfig(max_iterations=30, tolerance=1e-10)
        base = solve_ilqr(spec, config)
        ddp = solve_ilqr(spec, dataclasses.replace(config, ddp=True))
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(ddp.controls)
        )
        assert float(base.cost) == float(ddp.cost)

    def test_one_stage_gains_are_newton(self):
        """T=1: DDP's k must equal the exact Newton step of
        Q(x0, u) = l(x0, u) + V(step(x0, u))."""
        dt = 0.2
        dynamics = lambda x, u: jnp.array([jnp.sin(x[0]) + u[0] ** 3 + u[0]])
        terminal = lambda x: jnp.cosh(x[0] - 0.3)
        stage = lambda x, u, t: 0.1 * u[0] ** 2
        ocp = OCP(
            state_dim=1, control_dim=1, horizon_steps=1, dt=dt,
            initial_state=jnp.array([0.4]),
            dynamics=dynamics, stage_cost=stage, terminal_cost=terminal,
            initial_controls=jnp.array([[0.3]]),
        )
        ocp.initialize_problem()
        spec = ocp.spec()

        u0 = spec.initial_controls[0]
        x0 = spec.initial_state

        def Q(u):
            x1 = integrate_rk4(x0, u, dt, dynamics)
            return stage(x0, u, 0) + terminal(x1)

        newton_k = -jnp.linalg.solve(jax.hessian(Q)(u0), jax.grad(Q)(u0))

        from multi_agent_solver_tpu.solvers.ilqr import _backward_pass, _linearize

        config = ILQRConfig(max_iterations=1, tolerance=1e-12, ddp=True,
                            reg_init=0.0)
        xs = spec.rollout(spec.initial_controls)
        lin = _linearize(spec, config, xs, spec.initial_controls)
        k, K = _backward_pass(
            spec, config, xs, *lin[:7], spec.initial_controls, hess_dyn=lin[7]
        )
        np.testing.assert_allclose(float(k[0, 0]), float(newton_k[0]), rtol=1e-8)

        # Gauss-Newton (ddp off) must differ on this curvature-heavy problem.
        gn_config = dataclasses.replace(config, ddp=False)
        lin_gn = _linearize(spec, gn_config, xs, spec.initial_controls)
        k_gn, _ = _backward_pass(
            spec, gn_config, xs, *lin_gn[:7], spec.initial_controls
        )
        assert abs(float(k_gn[0, 0]) - float(newton_k[0])) > 1e-6

    def test_pendulum_converges_to_ilqr_optimum(self):
        from multi_agent_solver_tpu.models import pendulum_dynamics as pendulum_model

        ocp = OCP(
            state_dim=2, control_dim=1, horizon_steps=40, dt=0.05,
            initial_state=jnp.array([0.6, 0.0]),
            dynamics=pendulum_model,
            stage_cost=lambda x, u, t: 5.0 * x[0] ** 2 + 0.1 * x[1] ** 2
            + 0.05 * u[0] ** 2,
        )
        ocp.initialize_problem()
        config = ILQRConfig(max_iterations=60, tolerance=1e-10)
        base = solve_ilqr(ocp.spec(), config)
        ddp = solve_ilqr(ocp.spec(), dataclasses.replace(config, ddp=True))
        assert bool(ddp.converged)
        np.testing.assert_allclose(float(ddp.cost), float(base.cost), rtol=1e-6)

    def test_batched_routing_and_params(self):
        spec = lqr_ocp().spec()
        specs = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (3,) + leaf.shape), spec
        )
        config = ILQRConfig(max_iterations=10, tolerance=1e-8, ddp=True)
        result = solve_ilqr_batched(specs, config)   # forces the scan backward
        assert np.all(np.isfinite(np.asarray(result.cost)))

        solver = ILQR()
        solver.set_params({"max_iterations": 5, "tolerance": 1e-6,
                           "max_ms": 1e9, "ddp": 1})
        assert solver.config.ddp is True
