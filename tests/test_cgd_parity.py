"""CGD parity against the NumPy reference mirror (FD gradients, Armijo)."""

import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu import OCP, make_solver
from multi_agent_solver_tpu.models import pendulum_dynamics

from .reference_mirror import cgd_solve as mirror_cgd


def _small_pendulum_ocp():
    ocp = OCP(
        state_dim=2,
        control_dim=1,
        horizon_steps=8,
        dt=0.1,
        initial_state=jnp.array([2.5, 0.0]),
        dynamics=pendulum_dynamics,
        stage_cost=lambda x, u, t: (1.0 - jnp.cos(x[0])) + 0.1 * x[1] ** 2
        + 0.01 * u[0] ** 2,
        terminal_cost=lambda x: 5.0 * (1.0 - jnp.cos(x[0])) + x[1] ** 2,
        input_lower_bounds=jnp.array([-3.0]),
        input_upper_bounds=jnp.array([3.0]),
    )
    ocp.initialize_problem()
    return ocp


class TestCGDParity:
    def test_matches_mirror_with_fd_gradients(self):
        """fd_gradient=1 reproduces the reference's shooting-FD numerics; the
        mirror always runs max_iterations (its break is debug-gated), so pin
        tolerance below reachability."""
        ocp = _small_pendulum_ocp()
        result = make_solver(
            "cgd",
            {"max_iterations": 8, "tolerance": 1e-14, "max_ms": 1e9, "fd_gradient": 1},
        ).solve(ocp)

        g, l, m, b = 9.81, 1.0, 1.0, 0.1
        f = lambda x, u: np.array(
            [x[1], (g / l) * np.sin(x[0]) + u[0] / (m * l * l) - (b / (m * l * l)) * x[1]]
        )
        stage = lambda x, u, t: (1.0 - np.cos(x[0])) + 0.1 * x[1] ** 2 + 0.01 * u[0] ** 2
        terminal = lambda x: 5.0 * (1.0 - np.cos(x[0])) + x[1] ** 2
        X, U, cost = mirror_cgd(
            f, stage, terminal,
            x0=np.array([2.5, 0.0]), U0=np.zeros((8, 1)), dt=0.1,
            max_iterations=8,
            input_lower=np.array([-3.0]), input_upper=np.array([3.0]),
        )
        np.testing.assert_allclose(float(result.cost), cost, rtol=1e-6)
        np.testing.assert_allclose(np.array(result.controls), U, atol=1e-5)

    def test_ad_gradient_reaches_same_optimum(self):
        ocp_fd = _small_pendulum_ocp()
        r_fd = make_solver(
            "cgd", {"max_iterations": 200, "tolerance": 1e-10, "max_ms": 1e9,
                    "fd_gradient": 1},
        ).solve(ocp_fd)
        ocp_ad = _small_pendulum_ocp()
        r_ad = make_solver(
            "cgd", {"max_iterations": 200, "tolerance": 1e-10, "max_ms": 1e9},
        ).solve(ocp_ad)
        np.testing.assert_allclose(float(r_ad.cost), float(r_fd.cost), rtol=1e-4)
