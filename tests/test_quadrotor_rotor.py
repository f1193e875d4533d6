"""Rotor-lag quadrotor (nx=16, nu=4) -- the large-state gate's test model.

nx=16 > 12, so the iLQR auto gate hands the backward pass to the batched
XLA scan; ``backward='pallas'`` still works (the lane kernels are generic
in nx) and must agree -- the pallas-vs-scan crossover at nx=16 is measured
on the TPU in docs/BENCHMARKS.md using exactly this problem.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ocp import OCP
from multi_agent_solver_tpu.models import (
    HOVER_ROTOR_THRUST,
    quadrotor_rotor_dynamics,
)
from multi_agent_solver_tpu.models.quadrotor import GRAVITY, MASS
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQRConfig,
    solve_ilqr,
    solve_ilqr_batched,
)

W = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
               2.0, 2.0, 2.0, 0.1, 0.1, 0.1,
               0.01, 0.01, 0.01, 0.01])
U_HOVER = jnp.full(4, HOVER_ROTOR_THRUST)


def hover_ocp(horizon_steps: int = 30) -> OCP:
    """Start offset with attitude error and rotors at hover; regulate to
    the origin (rotor states weighted around hover thrust)."""
    x0 = jnp.zeros(16).at[0].set(1.0).at[1].set(-0.5).at[6].set(0.2)
    x0 = x0.at[12:16].set(HOVER_ROTOR_THRUST)

    def stage_cost(x, u, t):
        dx = x - jnp.zeros(16).at[12:16].set(HOVER_ROTOR_THRUST)
        du = u - U_HOVER
        return jnp.sum(W * dx * dx) + 0.1 * jnp.sum(du * du)

    def terminal_cost(x):
        dx = x - jnp.zeros(16).at[12:16].set(HOVER_ROTOR_THRUST)
        return 10.0 * jnp.sum(W * dx * dx)

    ocp = OCP(
        state_dim=16, control_dim=4, horizon_steps=horizon_steps, dt=0.05,
        initial_state=x0,
        dynamics=quadrotor_rotor_dynamics,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        initial_controls=jnp.tile(U_HOVER, (horizon_steps, 1)),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


class TestQuadrotorRotorModel:
    def test_hover_is_equilibrium(self):
        """At hover attitude with every rotor at mg/4 and matching commands,
        all derivatives vanish."""
        x = jnp.zeros(16).at[12:16].set(HOVER_ROTOR_THRUST)
        dx = quadrotor_rotor_dynamics(x, U_HOVER)
        np.testing.assert_allclose(np.asarray(dx), np.zeros(16), atol=1e-6)

    def test_rotor_lag_drives_thrust_to_command(self):
        """With rotors below command, w_dot > 0 and vertical accel reflects
        the CURRENT rotor thrust, not the command (the lag the model adds)."""
        x = jnp.zeros(16).at[12:16].set(0.5 * HOVER_ROTOR_THRUST)
        dx = quadrotor_rotor_dynamics(x, U_HOVER)
        assert float(dx[12]) > 0.0
        np.testing.assert_allclose(
            float(dx[5]), 0.5 * MASS * GRAVITY / MASS - GRAVITY, atol=1e-6
        )

    def test_differential_thrust_rolls_and_yaws(self):
        w = jnp.array([1.0, 2.0, 1.0, 0.5]) * HOVER_ROTOR_THRUST
        x = jnp.zeros(16).at[12:16].set(w)
        dx = quadrotor_rotor_dynamics(x, w)
        assert float(dx[9]) > 0.0     # p_dot: w1 > w3 rolls positive
        # w2 == w0 -> tau_y = 0 -> no pitch acceleration at zero rates
        np.testing.assert_allclose(float(dx[10]), 0.0, atol=1e-8)
        # tau_z = K_YAW*(w0 - w1 + w2 - w3) = K_YAW*(-0.5 h) < 0
        assert float(dx[11]) < 0.0

    def test_hover_regulation_converges(self):
        spec = hover_ocp(horizon_steps=40).spec()
        config = ILQRConfig(max_iterations=30, tolerance=1e-6)
        result = solve_ilqr(spec, config)
        xT = np.asarray(result.states)[-1]
        # 2 s horizon with 50 ms rotor lag: most of the 1.1 m offset is
        # recovered and the attitude is level.
        assert np.linalg.norm(xT[:3]) < 0.15
        assert np.linalg.norm(xT[6:9]) < 0.05
        assert np.isfinite(float(result.cost))

    def test_pallas_backward_matches_scan_at_nx16(self):
        """The lane kernels are generic in nx; at nx=16 the auto gate picks
        the scan but the pallas route must produce the same solves (the TPU
        crossover bench relies on their interchangeability)."""
        spec = hover_ocp(horizon_steps=12).spec()
        B = 4
        x0s = jnp.tile(spec.initial_state, (B, 1))
        x0s = x0s.at[:, 0].set(jnp.linspace(0.5, 1.5, B))
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0s)
        config = ILQRConfig(max_iterations=6, tolerance=1e-6)
        scan = solve_ilqr_batched(specs, config, backward="scan")
        pallas = solve_ilqr_batched(specs, config, backward="pallas")
        np.testing.assert_allclose(
            np.asarray(pallas.cost), np.asarray(scan.cost), rtol=2e-4
        )
