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


if __name__ == "__main__":
    for n_agents, n_scenarios in [(10, 1), (64, 1), (1024, 1), (64, 64), (256, 16)]:
        bench(n_agents, n_scenarios)
