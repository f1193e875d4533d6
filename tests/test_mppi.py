"""MPPI solver tests (beyond-reference sampling solver, solvers/mppi.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_agent_solver_tpu.solvers import make_solver
from multi_agent_solver_tpu.solvers.mppi import MPPIConfig, solve_mppi

from .problems import lqr_ocp, single_track_lane_ocp


class TestMPPI:
    def test_lqr_approaches_optimum(self):
        """On the LQR problem MPPI lands near the known joint optimum."""
        ocp = lqr_ocp()
        ilqr = make_solver("ilqr", {"max_iterations": 100, "tolerance": 1e-9,
                                    "max_ms": 0.0})
        opt = float(ilqr.solve(ocp).cost)   # exact Newton answer (7.25237)

        ocp2 = lqr_ocp()
        mppi = make_solver("mppi", {
            "max_iterations": 300, "tolerance": 0.0, "samples": 512,
            "temperature": 0.05, "sigma": 0.3, "max_ms": 0.0,
        })
        res = mppi.solve(ocp2)
        assert float(res.cost) < opt * 1.05
        # Result written back into the OCP like every solver.
        assert float(ocp2.best_cost) == pytest.approx(float(res.cost))

    def test_respects_input_box(self):
        ocp = single_track_lane_ocp()
        mppi = make_solver("mppi", {"max_iterations": 30, "tolerance": 0.0,
                                    "samples": 128, "sigma": 0.4,
                                    "max_ms": 0.0})
        res = mppi.solve(ocp)
        us = np.asarray(res.controls)
        assert np.all(us[:, 0] >= -0.7 - 1e-12) and np.all(us[:, 0] <= 0.7 + 1e-12)
        assert np.all(us[:, 1] >= -1.0 - 1e-12) and np.all(us[:, 1] <= 1.0 + 1e-12)

    def test_single_track_near_ilqr(self):
        """MPPI reaches the right cost regime on the headline problem."""
        ocp = single_track_lane_ocp()
        mppi = make_solver("mppi", {
            "max_iterations": 200, "tolerance": 0.0, "samples": 512,
            "temperature": 0.2, "sigma": 0.25, "max_ms": 0.0,
        })
        res = mppi.solve(ocp)
        # iLQR's optimum is ~179.9 (docs/PARITY.md); the zero-control seed
        # costs ~492.  MPPI should close most of that gap.
        assert float(res.cost) < 220.0

    def test_monotone_safeguard(self):
        """With monotone acceptance the tracked cost never increases."""
        ocp = single_track_lane_ocp()
        spec = ocp.spec()
        config = MPPIConfig(max_iterations=40, tolerance=0.0, num_samples=64,
                            sigma=0.5, temperature=1.0)
        res = solve_mppi(spec, config)
        seed_cost = float(spec.cost(spec.rollout(spec.initial_controls),
                                    spec.initial_controls))
        assert float(res.cost) <= seed_cost + 1e-9

    def test_vmap_matches_single(self):
        """Vmapped batch solves reproduce per-problem solves exactly
        (noise keys derive from each lane's initial state)."""
        spec = single_track_lane_ocp().spec()
        config = MPPIConfig(max_iterations=10, tolerance=0.0, num_samples=64)
        x0s = jnp.stack([
            jnp.array([0.0, 1.0, 0.0, 0.0]),
            jnp.array([0.0, -0.5, 0.0, 0.3]),
        ]).astype(spec.initial_state.dtype)
        batched = jax.jit(jax.vmap(
            lambda s0: solve_mppi(spec.replace(initial_state=s0), config)
        ))(x0s)
        for i in range(2):
            single = solve_mppi(spec.replace(initial_state=x0s[i]), config)
            np.testing.assert_allclose(
                np.asarray(batched.controls)[i], np.asarray(single.controls),
                rtol=0, atol=1e-12,
            )

    def test_constraint_penalty_enforces(self):
        """A speed-cap inequality is (softly) enforced through the penalty."""
        def speed_cap(x, u):
            return jnp.array([x[3] - 0.8])    # v <= 0.8

        ocp = single_track_lane_ocp(inequality_constraints=speed_cap)
        mppi = make_solver("mppi", {
            "max_iterations": 150, "tolerance": 0.0, "samples": 256,
            "sigma": 0.3, "temperature": 0.2, "constraint_penalty": 1e3,
            "max_ms": 0.0,
        })
        res = mppi.solve(ocp)
        v = np.asarray(res.states)[:, 3]
        assert v.max() < 0.9      # soft penalty: small overshoot allowed

    def test_alias_and_registry(self):
        from multi_agent_solver_tpu.solvers import canonical_solver_name

        assert canonical_solver_name("MPPI") == "mppi"
        assert canonical_solver_name("path-integral") == "mppi"
