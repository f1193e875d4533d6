"""Differentiable solves (``differentiable=1``).

``jax.grad`` flows through an entire AL-iLQR solve into problem parameters:
the outer while_loop becomes a bounded rematerialized fori_loop with the
identical fixed point (unrolled differentiation of the optimizer).  No
reference counterpart exists -- a C++/Eigen solver cannot be differentiated.

Checks:
* forward parity: the differentiable loop returns bit-identical results to
  the while_loop solve;
* d(optimal cost)/d(initial state) matches central finite differences;
* d(optimal cost)/d(cost weight, via context) matches finite differences;
* the batched entry routes through the same differentiable path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ocp import OCP, with_context_cost
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQR,
    ILQRConfig,
    solve_ilqr,
    solve_ilqr_batched,
)

from .problems import single_track_lane_ocp

CONFIG = ILQRConfig(max_iterations=12, tolerance=1e-9, differentiable=True)


def _spec():
    return single_track_lane_ocp(horizon_steps=20).spec()


class TestDifferentiable:
    def test_forward_parity_with_while_loop(self):
        spec = _spec()
        base = solve_ilqr(spec, dataclasses.replace(CONFIG, differentiable=False))
        diff = solve_ilqr(spec, CONFIG)
        np.testing.assert_array_equal(np.asarray(base.states), np.asarray(diff.states))
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(diff.controls)
        )
        assert float(base.cost) == float(diff.cost)
        assert int(base.iterations) == int(diff.iterations)

    def test_grad_wrt_initial_state_matches_fd(self):
        spec = _spec()

        def optimal_cost(x0):
            return solve_ilqr(spec.replace(initial_state=x0), CONFIG).cost

        x0 = spec.initial_state
        g = jax.grad(optimal_cost)(x0)
        assert np.all(np.isfinite(np.asarray(g)))
        eps = 1e-5
        for i in range(x0.shape[0]):
            e = jnp.zeros_like(x0).at[i].set(eps)
            fd = (optimal_cost(x0 + e) - optimal_cost(x0 - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-3, atol=1e-6)

    def test_grad_wrt_cost_weight_matches_fd(self):
        """Learned-cost use case: differentiate through the solve w.r.t. a
        stage-cost weight delivered through the context leaf."""
        base = _spec()
        T = base.horizon_steps
        stage = base.stage_cost
        spec = with_context_cost(
            base, lambda x, u, t, w: w[0] * x[1] ** 2 + stage(x, u, t)
        )

        def optimal_cost(w):
            ctx = jnp.full((T, 1), w, base.initial_state.dtype)
            return solve_ilqr(spec.replace(context=ctx), CONFIG).cost

        w0 = jnp.asarray(2.0)
        g = jax.grad(optimal_cost)(w0)
        eps = 1e-5
        fd = (optimal_cost(w0 + eps) - optimal_cost(w0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-3)
        # Heavier lateral penalty must increase the achieved optimal cost.
        assert float(g) > 0.0

    def test_batched_entry_is_differentiable(self):
        spec = _spec()
        x0s = jnp.stack([spec.initial_state, spec.initial_state.at[1].set(0.5)])

        def total_cost(x0_batch):
            specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0_batch)
            return jnp.sum(solve_ilqr_batched(specs, CONFIG).cost)

        g = jax.grad(total_cost)(x0s)
        assert g.shape == x0s.shape
        assert np.all(np.isfinite(np.asarray(g)))

    def test_param_spelling(self):
        solver = ILQR()
        solver.set_params({"max_iterations": 5, "tolerance": 1e-6,
                           "max_ms": 1e9, "differentiable": 1})
        assert solver.config.differentiable is True


class TestDifferentiableCGD:
    def test_cgd_forward_parity_and_grad(self):
        from multi_agent_solver_tpu.solvers.cgd import CGDConfig, solve_cgd

        spec = _spec()
        cfg = CGDConfig(max_iterations=25, tolerance=1e-10)
        dcfg = dataclasses.replace(cfg, differentiable=True)
        base = solve_cgd(spec, cfg)
        diff = solve_cgd(spec, dcfg)
        np.testing.assert_array_equal(
            np.asarray(base.controls), np.asarray(diff.controls)
        )
        assert float(base.cost) == float(diff.cost)

        def optimal_cost(x0):
            return solve_cgd(spec.replace(initial_state=x0), dcfg).cost

        x0 = spec.initial_state
        g = jax.grad(optimal_cost)(x0)
        eps = 1e-5
        e = jnp.zeros_like(x0).at[1].set(eps)
        fd = (optimal_cost(x0 + e) - optimal_cost(x0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[1]), float(fd), rtol=2e-3)
