"""Randomized parity fuzzing: reference-mode iLQR vs the NumPy mirror.

Property-based evidence that the parity mode reproduces the reference
algorithm on arbitrary problems, not just the pinned examples: random
nonlinear dynamics and random (positive-definite) quadratic costs, random
initial states and bounds -- trajectories must match the independently
written sequential NumPy transcription step for step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_agent_solver_tpu import OCP, make_solver

from .reference_mirror import ilqr_solve as mirror_ilqr


def _random_problem(seed, T=12, nx=3, nu=2):
    rng = np.random.RandomState(seed)
    W1 = rng.randn(nx, nx) * 0.4
    W2 = rng.randn(nx, nu) * 0.4
    bvec = rng.randn(nx) * 0.2
    Mq = rng.randn(nx, nx)
    Q = (Mq @ Mq.T) * 0.1 + 0.1 * np.eye(nx)
    Mr = rng.randn(nu, nu)
    R = (Mr @ Mr.T) * 0.1 + 0.2 * np.eye(nu)
    Qf = Q * 2.0
    x0 = rng.randn(nx)
    has_bounds = bool(seed % 2)
    ub = rng.uniform(0.5, 1.5, nu)

    # smooth nonlinear dynamics: tanh mixing + control affine
    f_np = lambda x, u: np.tanh(W1 @ x) + W2 @ u + bvec
    f_jx = lambda x, u: jnp.tanh(jnp.asarray(W1) @ x) + jnp.asarray(W2) @ u + jnp.asarray(bvec)

    stage_np = lambda x, u, t: float(x @ Q @ x + u @ R @ u)
    terminal_np = lambda x: float(x @ Qf @ x)

    ocp = OCP(
        state_dim=nx, control_dim=nu, horizon_steps=T, dt=0.1,
        initial_state=jnp.asarray(x0),
        dynamics=f_jx,
        stage_cost=lambda x, u, t: x @ jnp.asarray(Q) @ x + u @ jnp.asarray(R) @ u,
        terminal_cost=lambda x: x @ jnp.asarray(Qf) @ x,
        input_lower_bounds=jnp.asarray(-ub) if has_bounds else None,
        input_upper_bounds=jnp.asarray(ub) if has_bounds else None,
    )
    ocp.initialize_problem()

    mirror_args = dict(
        f=f_np,
        # Analytic continuous Jacobians (tanh chain rule; control-affine).
        fx=lambda x, u: (1.0 - np.tanh(W1 @ x) ** 2)[:, None] * W1,
        fu=lambda x, u: W2,
        stage=stage_np,
        terminal=terminal_np,
        lx=lambda x, u, t: 2.0 * (Q @ x),
        lu=lambda x, u, t: 2.0 * (R @ u),
        lxx=lambda x, u, t: 2.0 * Q,
        luu=lambda x, u, t: 2.0 * R,
        lux=lambda x, u, t: np.zeros((nu, nx)),
        phix=lambda x: 2.0 * (Qf @ x),
        phixx=lambda x: 2.0 * Qf,
        x0=x0,
        U0=np.zeros((T, nu)),
        dt=0.1,
        input_lower=-ub if has_bounds else None,
        input_upper=ub if has_bounds else None,
    )
    return ocp, mirror_args


class TestParityFuzz:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_continuous_mode_matches_mirror(self, seed):
        ocp, margs = _random_problem(seed)
        solver = make_solver(
            "ilqr",
            {"max_iterations": 6, "tolerance": 1e-12, "max_ms": 1e9,
             "continuous_jacobians": 1},
        )
        result = solver.solve(ocp)
        X, U, cost, _ = mirror_ilqr(
            margs["f"], margs["fx"], margs["fu"], margs["stage"],
            margs["terminal"], margs["lx"], margs["lu"], margs["lxx"],
            margs["luu"], margs["lux"], margs["phix"], margs["phixx"],
            x0=margs["x0"], U0=margs["U0"], dt=margs["dt"],
            max_iterations=6, tolerance=1e-12,
            input_lower=margs["input_lower"], input_upper=margs["input_upper"],
        )
        np.testing.assert_allclose(float(result.cost), cost, rtol=1e-8,
                                   err_msg=f"seed {seed}")
        np.testing.assert_allclose(np.array(result.controls), U, atol=1e-7,
                                   err_msg=f"seed {seed}")
