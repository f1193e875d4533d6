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


def build(batch: int, horizon: int, iters: int):
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
    config = ILQRConfig(max_iterations=iters, tolerance=1e-6)

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

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
