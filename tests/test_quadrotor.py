"""Quadrotor model (nx=12, nu=4 -- beyond the reference's model zoo).

Exercises the large-state route (nx=12 is the zoo's second-largest model;
since round 3 the auto gate keeps it on the fused Pallas kernels, measured
3.5x the scan route -- docs/BENCHMARKS.md), and the solve must reach a
stabilizing hover.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ocp import OCP
from multi_agent_solver_tpu.models import quadrotor_dynamics, HOVER_THRUST
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQRConfig,
    solve_ilqr,
    solve_ilqr_batched,
)


def hover_ocp(horizon_steps: int = 40) -> OCP:
    """Start 1 m off target with attitude error; regulate to hover at origin."""
    x0 = jnp.zeros(12).at[0].set(1.0).at[1].set(-0.5).at[2].set(0.5)
    x0 = x0.at[6].set(0.2).at[7].set(-0.1)
    w = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
                   2.0, 2.0, 2.0, 0.1, 0.1, 0.1])

    def stage_cost(x, u, t):
        du = u - jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0])
        ru = jnp.array([0.1, 1.0, 1.0, 1.0])
        return jnp.sum(w * x * x) + jnp.sum(ru * du * du)

    ocp = OCP(
        state_dim=12, control_dim=4, horizon_steps=horizon_steps, dt=0.05,
        initial_state=x0,
        dynamics=quadrotor_dynamics,
        stage_cost=stage_cost,
        terminal_cost=lambda x: 10.0 * jnp.sum(w * x * x),
        initial_controls=jnp.tile(
            jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0]), (horizon_steps, 1)
        ),
    )
    ocp.initialize_problem()
    ocp.verify_problem()
    return ocp


class TestQuadrotorSwarm:
    """Coupled Nash game in 3D: four drones swap antipodal positions.

    Uncoupled best responses fly straight through the shared center;
    the 3D collision coupling must separate the paths -- the coupled-game
    capability (beyond the reference) composed with the nx=12 model.
    """

    def _swap_problem(self, coupled: bool):
        from multi_agent_solver_tpu import Agent, MultiAgentProblem

        radius, z0, T, dt = 2.0, 1.0, 24, 0.05
        w = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
                       2.0, 2.0, 2.0, 0.1, 0.1, 0.1], jnp.float64)
        u_hover = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0], jnp.float64)
        ru = jnp.array([0.1, 1.0, 1.0, 1.0], jnp.float64)

        def make(agent_id: int, angle: float) -> Agent:
            # Staggered start altitudes break the 90-degree rotational
            # symmetry -- identical Jacobi best responses to a perfectly
            # symmetric game stay symmetric and still meet at the center.
            zi = z0 + 0.05 * agent_id
            start = jnp.zeros(12, jnp.float64)
            start = start.at[0].set(radius * np.cos(angle))
            start = start.at[1].set(radius * np.sin(angle)).at[2].set(zi)
            goal = start[:3] * jnp.array([-1.0, -1.0, 1.0])

            def stage_cost(x, u, t):
                dx = x - jnp.zeros(12).at[:3].set(goal)
                du = u - u_hover
                return jnp.sum(w * dx * dx) + jnp.sum(ru * du * du)

            ocp = OCP(
                state_dim=12, control_dim=4, horizon_steps=T, dt=dt,
                initial_state=start,
                dynamics=quadrotor_dynamics,
                stage_cost=stage_cost,
                initial_controls=jnp.tile(u_hover, (T, 1)),
            )
            ocp.initialize_problem()
            return Agent(agent_id, ocp)

        problem = MultiAgentProblem()
        for i in range(4):
            problem.add_agent(make(i, 2.0 * np.pi * i / 4))
        if coupled:
            def collision_cost(x_i, x_j, t):
                d2 = jnp.sum((x_i[:3] - x_j[:3]) ** 2)
                return 40.0 * jnp.exp(-d2 / 0.5)

            problem.inter_agent_cost = collision_cost
        return problem

    def _min_pairwise(self, solution) -> float:
        pos = np.stack([np.asarray(s)[:, :3] for s in solution.states])
        n = pos.shape[0]
        dmin = np.inf
        for i in range(n):
            for j in range(i + 1, n):
                d = np.sqrt(((pos[i] - pos[j]) ** 2).sum(axis=1)).min()
                dmin = min(dmin, d)
        return float(dmin)

    def test_coupled_swarm_separates(self):
        from multi_agent_solver_tpu import make_solver, make_strategy, solve_multi_agent

        params = {"max_iterations": 30, "tolerance": 1e-8, "max_ms": 1e9}
        uncoupled = solve_multi_agent(
            make_strategy("sequential", make_solver("ilqr"), params, 2),
            self._swap_problem(coupled=False),
        )
        # The near-symmetric game needs several Jacobi sweeps to funnel the
        # drones into staggered passing lanes (sweep 1-2 still ping-pongs).
        coupled = solve_multi_agent(
            make_strategy("sequential", make_solver("ilqr"), params, 8),
            self._swap_problem(coupled=True),
        )
        d_unc = self._min_pairwise(uncoupled)
        d_cpl = self._min_pairwise(coupled)
        # The coupling must buy real separation over the straight-through game.
        assert d_cpl > 2.0 * d_unc, (d_unc, d_cpl)
        assert d_cpl > 0.4, d_cpl


class TestQuadrotor:
    def test_dynamics_hover_equilibrium(self):
        x = jnp.zeros(12)
        u = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0])
        dx = np.asarray(quadrotor_dynamics(x, u))
        np.testing.assert_allclose(dx, np.zeros(12), atol=1e-12)

    def test_dynamics_finite_through_gimbal_lock(self):
        x = jnp.zeros(12).at[7].set(np.pi / 2).at[10].set(1.0)
        u = jnp.array([HOVER_THRUST, 0.01, 0.01, 0.01])
        dx = quadrotor_dynamics(x, u)
        assert np.all(np.isfinite(np.asarray(dx)))
        A = jax.jacfwd(quadrotor_dynamics, 0)(x, u)
        assert np.all(np.isfinite(np.asarray(A)))

    def test_hover_regulation_converges(self):
        spec = hover_ocp().spec()
        result = solve_ilqr(spec, ILQRConfig(max_iterations=60, tolerance=1e-8))
        xs = np.asarray(result.states)
        # Position error shrinks by >10x over the horizon.
        assert np.linalg.norm(xs[-1, :3]) < 0.1 * np.linalg.norm(xs[0, :3])
        # Attitude comes back near level.
        assert np.linalg.norm(xs[-1, 6:9]) < 0.1
        assert np.isfinite(float(result.cost))

    def test_batched_matches_single(self):
        """nx=12 rides the scan backward; batched lanes match single solves."""
        spec = hover_ocp(horizon_steps=12).spec()
        dx0 = jnp.array([0.5, 1.0])
        specs = jax.vmap(
            lambda d: spec.replace(initial_state=spec.initial_state.at[0].set(d))
        )(dx0)
        config = ILQRConfig(max_iterations=6, tolerance=1e-8)
        batched = solve_ilqr_batched(specs, config)
        for i, d in enumerate(np.asarray(dx0)):
            single = solve_ilqr(
                spec.replace(initial_state=spec.initial_state.at[0].set(float(d))),
                config,
            )
            np.testing.assert_allclose(
                float(batched.cost[i]), float(single.cost), rtol=1e-8
            )
