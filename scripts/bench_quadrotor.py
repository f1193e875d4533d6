"""Quadrotor (nx=12, nu=4) batched iLQR throughput on the real TPU.

Large-state probe of the auto-gated scan backward (nx > 8 leaves the lane
kernels; batched [12,12] matmuls feed the MXU).  Same chained-input timing
methodology as bench.py: each rep's input is perturbed by a scalar derived
from the previous rep's output, and synced with a host fetch, so the
remote-TPU tunnel cache cannot serve a repeat.

Usage: python scripts/bench_quadrotor.py [--batch 8192] [--reps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch: int, horizon: int, iters: int, lane_fold: int = 0):
    from multi_agent_solver_tpu.models import quadrotor_dynamics, HOVER_THRUST
    from multi_agent_solver_tpu.ocp import OCP
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    w = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
                   2.0, 2.0, 2.0, 0.1, 0.1, 0.1], jnp.float32)
    u_hover = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0], jnp.float32)
    ru = jnp.array([0.1, 1.0, 1.0, 1.0], jnp.float32)

    def stage_cost(x, u, t):
        du = u - u_hover
        return jnp.sum(w * x * x) + jnp.sum(ru * du * du)

    ocp = OCP(
        state_dim=12, control_dim=4, horizon_steps=horizon, dt=0.05,
        initial_state=jnp.zeros(12, jnp.float32).at[0].set(1.0),
        dynamics=quadrotor_dynamics,
        stage_cost=stage_cost,
        terminal_cost=lambda x: 10.0 * jnp.sum(w * x * x),
        initial_controls=jnp.tile(u_hover, (horizon, 1)),
    )
    ocp.initialize_problem()
    spec = ocp.spec()
    config = ILQRConfig(max_iterations=iters, tolerance=1e-6,
                        lane_fold=lane_fold)

    rng = np.random.RandomState(0)
    x0 = np.zeros((batch, 12), np.float32)
    x0[:, :3] = rng.uniform(-1.0, 1.0, (batch, 3))
    x0[:, 6:8] = rng.uniform(-0.2, 0.2, (batch, 2))
    x0 = jnp.asarray(x0)

    @jax.jit
    def solve_batch(x0_batch):
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0_batch)
        return solve_ilqr_batched(specs, config)

    return solve_batch, x0


def bench_swarm(n_agents: int, sweeps: int, iters: int) -> None:
    """Coupled quadrotor Nash game (3D collision avoidance) on the TPU.

    N drones on a circle swap to antipodal positions through the full host
    strategy API (stacking, coupling contexts, scatter-back); reports wall
    time for the whole coupled game and the final minimum pairwise
    distance (uncoupled drones fly through the shared center).
    """
    from multi_agent_solver_tpu import (
        Agent, MultiAgentProblem, make_solver, make_strategy, solve_multi_agent,
    )
    from multi_agent_solver_tpu.models import quadrotor_dynamics, HOVER_THRUST
    from multi_agent_solver_tpu.ocp import OCP

    radius, T, dt = 3.0, 24, 0.05
    w = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
                   2.0, 2.0, 2.0, 0.1, 0.1, 0.1], jnp.float32)
    u_hover = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0], jnp.float32)
    ru = jnp.array([0.1, 1.0, 1.0, 1.0], jnp.float32)

    def make(i: int) -> Agent:
        ang = 2.0 * np.pi * i / n_agents
        zi = 1.0 + 0.1 * i                # staggered altitude breaks symmetry
        start = jnp.zeros(12, jnp.float32)
        start = start.at[0].set(radius * np.cos(ang))
        start = start.at[1].set(radius * np.sin(ang)).at[2].set(zi)
        goal = start[:3] * jnp.array([-1.0, -1.0, 1.0])

        def stage_cost(x, u, t):
            dx = x - jnp.zeros(12).at[:3].set(goal)
            du = u - u_hover
            return jnp.sum(w * dx * dx) + jnp.sum(ru * du * du)

        ocp = OCP(
            state_dim=12, control_dim=4, horizon_steps=T, dt=dt,
            initial_state=start, dynamics=quadrotor_dynamics,
            stage_cost=stage_cost,
            initial_controls=jnp.tile(u_hover, (T, 1)),
        )
        ocp.initialize_problem()
        return Agent(i, ocp)

    problem = MultiAgentProblem()
    for i in range(n_agents):
        problem.add_agent(make(i))
    problem.inter_agent_cost = lambda xi, xj, t: 60.0 * jnp.exp(
        -jnp.sum((xi[:3] - xj[:3]) ** 2) / 1.0
    )
    params = {"max_iterations": iters, "tolerance": 1e-6, "max_ms": 1e9}
    strategy = make_strategy("sequential", make_solver("ilqr"), params, sweeps)

    t0 = time.perf_counter()
    sol = solve_multi_agent(strategy, problem)       # includes compile
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = solve_multi_agent(strategy, problem)
    t_warm = time.perf_counter() - t0

    pos = np.stack([np.asarray(s)[:, :3] for s in sol.states])
    dmin = min(
        float(np.sqrt(((pos[i] - pos[j]) ** 2).sum(axis=1)).min())
        for i in range(n_agents) for j in range(i + 1, n_agents)
    )
    print(
        f"quadrotor swarm n={n_agents} sweeps={sweeps} iters={iters}: "
        f"cold {t_cold:.2f} s, warm {t_warm:.2f} s "
        f"({n_agents * sweeps / t_warm:,.0f} agent-solves/s), "
        f"min pairwise distance {dmin:.2f} m, total cost {float(sol.total_cost):,.1f}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--swarm", type=int, default=0,
                    help="run the coupled N-drone Nash game instead")
    ap.add_argument("--sweeps", type=int, default=8)
    ap.add_argument("--swarm-iters", type=int, default=30,
                    help="iLQR iterations per best response in swarm mode")
    args = ap.parse_args()

    if args.swarm:
        bench_swarm(args.swarm, args.sweeps, args.swarm_iters)
        return

    solve_batch, x0 = build(args.batch, args.horizon, args.iters)
    result = solve_batch(x0)
    acc = result.cost[0] * 1e-12
    float(acc)
    print(f"warmup ok: median cost {float(jnp.median(result.cost)):.4f}, "
          f"backend {x0.devices()}", file=sys.stderr)

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        result = solve_batch(x0 + acc)
        acc = result.cost[0] * 1e-12
        float(acc)
        times.append(time.perf_counter() - t0)
    rates = args.batch / np.asarray(times)
    print(
        f"quadrotor nx=12 T={args.horizon} iters={args.iters} "
        f"batch={args.batch}: median {np.median(rates):,.0f} solves/s "
        f"(IQR {np.percentile(rates, 25):,.0f}-{np.percentile(rates, 75):,.0f}), "
        f"median wall {np.median(times) * 1e3:.1f} ms"
    )


if __name__ == "__main__":
    main()
