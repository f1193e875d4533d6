#!/usr/bin/env python3
"""Multi-agent throughput benchmark: batched Nash sweeps on TPU.

Measures agent-sweeps/s for the circular-track problem (the reference's
multi-agent benchmark, multi_agent_single_track.cpp) at growing agent counts,
plus the batched-scenario axis (fleets of multi-agent problems).
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.examples.multi_agent_single_track import (
    create_single_track_circular_ocp,
)
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched


def bench(n_agents: int, n_scenarios: int, iters: int = 5):
    template = create_single_track_circular_ocp(0.0).spec()
    thetas = 2.0 * np.pi * np.arange(n_agents) / n_agents
    x0 = np.stack(
        [
            20.0 * np.cos(thetas),
            20.0 * np.sin(thetas),
            1.57 + thetas,
            4.0 * np.ones_like(thetas),
        ],
        axis=-1,
    ).astype(np.float32)
    x0 = jnp.asarray(np.tile(x0, (n_scenarios, 1)))   # [S*N, 4]

    config = ILQRConfig(max_iterations=100, tolerance=1e-5)

    @jax.jit
    def sweep(x0_batch):
        specs = jax.vmap(lambda s: template.replace(initial_state=s))(x0_batch)
        result = solve_ilqr_batched(specs, config)
        return result.cost, result.controls

    # Chained distinct inputs + host-fetch sync: repeated identical calls
    # through the tunnel can be served from a cache without executing
    # (docs/BENCHMARKS.md "Timing methodology").
    cost, _ = sweep(x0)
    acc = cost[0] * 1e-12
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        cost, controls = sweep(x0 + acc)
        acc = cost[0] * 1e-12
    float(acc)
    dt = (time.perf_counter() - t0) / iters

    total_agents = n_agents * n_scenarios
    print(json.dumps({
        "metric": "nash_sweep_agents_per_s",
        "agents": n_agents,
        "scenarios": n_scenarios,
        "sweep_ms": round(dt * 1e3, 2),
        "agents_per_s": round(total_agents / dt, 1),
        "total_cost_per_scenario": round(float(jnp.sum(cost)) / n_scenarios, 4),
    }))


def bench_coupled(n_agents: int, max_outer: int = 10, reps: int = 5,
                  coupling: float = 25.0, neighbors=None):
    """Coupled (true Nash) Jacobi sweeps: every agent best-responds against
    the others' frozen plans via the inter-agent collision cost -- the
    auto-fused coupled path (a capability the reference lacks entirely)."""
    from multi_agent_solver_tpu.examples.multi_agent_single_track import (
        build_problem,
    )
    from multi_agent_solver_tpu.solvers import make_solver
    from multi_agent_solver_tpu.strategies import make_strategy
    from multi_agent_solver_tpu.strategies import solve as solve_strategy

    problem = build_problem(n_agents, coupling=coupling)
    if neighbors is not None:
        problem.coupling_neighbors = neighbors
    params = {"max_iterations": 100, "tolerance": 1e-5, "max_ms": 1e9}
    strategy = make_strategy("sequential", make_solver("ilqr"), params, max_outer)

    base_x0 = [np.asarray(b.agent.ocp.initial_state) for b in problem.blocks]
    solution = solve_strategy(strategy, problem)       # warmup/compile
    acc = float(solution.total_cost) * 1e-12
    times = []
    for _ in range(reps):
        for b, x0b in zip(problem.blocks, base_x0):
            b.agent.ocp.initial_state = jnp.asarray(x0b + acc)
            b.agent.ocp.initialize_problem()
        t0 = time.perf_counter()
        solution = solve_strategy(strategy, problem)
        acc = float(solution.total_cost) * 1e-12       # host sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(json.dumps({
        "metric": "coupled_nash_agent_solves_per_s",
        "agents": n_agents,
        "max_outer": max_outer,
        "coupling_neighbors": neighbors,
        "wall_ms": round(dt * 1e3, 2),
        "agent_solves_per_s": round(n_agents * max_outer / dt, 1),
        "total_cost": round(float(solution.total_cost), 4),
    }))


if __name__ == "__main__":
    for n_agents, n_scenarios in [(10, 1), (64, 1), (1024, 1), (64, 64), (256, 16)]:
        bench(n_agents, n_scenarios)
    for n_agents, neighbors in [(10, None), (64, None), (256, 8), (1024, 8)]:
        bench_coupled(n_agents, neighbors=neighbors)
