"""Cart-pole swing-up tests (models/cartpole.py; no reference counterpart)."""

import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu import OCP
from multi_agent_solver_tpu.models import (
    cartpole_dynamics,
    cartpole_swing_up_stage_cost,
    cartpole_swing_up_terminal_cost,
)
from multi_agent_solver_tpu.solvers import make_solver


def cartpole_ocp(**overrides) -> OCP:
    T = 60
    kwargs = dict(
        state_dim=4,
        control_dim=1,
        horizon_steps=T,
        dt=0.05,
        initial_state=jnp.array([0.0, 0.05, 0.0, 0.0]),  # near hanging-down
        dynamics=cartpole_dynamics,
        stage_cost=cartpole_swing_up_stage_cost,
        terminal_cost=cartpole_swing_up_terminal_cost,
        input_lower_bounds=jnp.array([-12.0]),
        input_upper_bounds=jnp.array([12.0]),
        # Symmetry-breaking seed (same trick as the reference's pendulum
        # swing-up, pendulum_swing_up.cpp:119-124).
        initial_controls=2.0 * jnp.sin(
            2.0 * jnp.pi * jnp.arange(T, dtype=jnp.float64)[:, None] / T
        ),
    )
    kwargs.update(overrides)
    ocp = OCP(**kwargs)
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


class TestCartpole:
    def test_dynamics_sanity(self):
        """At rest hanging down, gravity produces no acceleration; a push
        accelerates the cart and rotates the pole the opposite way."""
        x0 = jnp.zeros(4)
        dx = np.asarray(cartpole_dynamics(x0, jnp.zeros(1)))
        np.testing.assert_allclose(dx, 0.0, atol=1e-12)
        dx = np.asarray(cartpole_dynamics(x0, jnp.array([1.0])))
        assert dx[2] > 0.0 and dx[3] < 0.0

    def test_energy_conservation_unforced(self):
        """Frictionless model: total energy is conserved along an RK4 roll."""
        ocp = cartpole_ocp(initial_state=jnp.array([0.0, 2.0, 0.0, 0.0]),
                           initial_controls=jnp.zeros((60, 1)))
        spec = ocp.spec()
        xs = np.asarray(spec.rollout(jnp.zeros((60, 1))))

        def energy(x):
            p, th, pd, thd = x
            # cart KE + pole KE (translational + rotational about pivot)
            v_pole_x = pd + 0.5 * thd * np.cos(th)
            v_pole_y = 0.5 * thd * np.sin(th)
            ke = 0.5 * 1.0 * pd**2 + 0.5 * 0.3 * (v_pole_x**2 + v_pole_y**2)
            pe = -0.3 * 9.81 * 0.5 * np.cos(th)
            return ke + pe

        e = np.array([energy(x) for x in xs])
        # RK4 at dt=0.05 on a fast swing: bounded drift, no secular growth.
        np.testing.assert_allclose(e, e[0], rtol=0, atol=2e-3)

    def test_mppi_seeded_ilqr_swings_up(self):
        """The canonical solver composition: derivative-free MPPI finds the
        swing-up basin (plain iLQR stalls at cost ~1330 here, even with 16
        multistarts), then Newton-quality iLQR polishes to the upright.

        This is what `update_initial_with_best` warm-starting is for
        (reference ocp.hpp:95-100)."""
        ocp = cartpole_ocp()
        mppi = make_solver("mppi", {
            "max_iterations": 150, "tolerance": 0.0, "samples": 256,
            "sigma": 2.0, "temperature": 1.0, "max_ms": 0.0,
        })
        mppi.solve(ocp)
        ocp.update_initial_with_best()
        ilqr = make_solver("ilqr", {"max_iterations": 300,
                                    "tolerance": 1e-7, "max_ms": 0.0})
        res = ilqr.solve(ocp)
        theta_T = float(res.states[-1, 1])
        # Upright = odd multiple of pi; the shaping cost drives |1+cos| -> 0.
        assert abs(1.0 + np.cos(theta_T)) < 0.05, theta_T
        assert abs(float(res.states[-1, 3])) < 1.0   # nearly at rest

    def test_mppi_improves_far_from_seed(self):
        """Derivative-free MPPI makes large progress on the same problem."""
        ocp = cartpole_ocp()
        spec = ocp.spec()
        seed_cost = float(spec.cost(spec.rollout(spec.initial_controls),
                                    spec.initial_controls))
        mppi = make_solver("mppi", {
            "max_iterations": 150, "tolerance": 0.0, "samples": 256,
            "sigma": 2.0, "temperature": 1.0, "max_ms": 0.0,
        })
        res = mppi.solve(ocp)
        assert float(res.cost) < 0.5 * seed_cost
