#!/usr/bin/env python3
"""QP-family benchmarks: batched SQP throughput + ADMM-vs-IP comparison.

Two measurements backing docs/BENCHMARKS.md's QP rows:

1. Batched SQP solvers on the single-track problem (TPU or CPU): solves/s
   for `osqp_collocation` / `osqp_shooting` with the structured
   block-tridiagonal backend, lockstep batch (the slowest lane's QP
   bounds every step).
2. Single trajectory QP at tight tolerance (eps 1e-9, T=81): the ADMM
   backend vs the f64 interior-point backend (requires x64 -- run with
   BENCH_QP_X64=1 on CPU).

Env: BENCH_QP_BATCH (default 1024), BENCH_QP_REPS (default 5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import jax

if os.environ.get("BENCH_QP_X64"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def bench_sqp_batched(batch, reps):
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.osqp_collocation import (
        OSQPCollocationConfig, solve_osqp_collocation,
    )
    from multi_agent_solver_tpu.solvers.osqp_shooting import (
        OSQPShootingConfig, solve_osqp_shooting,
    )

    spec = _single_track_spec(dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x0 = np.zeros((batch, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, batch)
    x0[:, 3] = rng.uniform(0, 0.5, batch)
    x0 = jnp.asarray(x0)

    for name, solve, cfg in (
        ("osqp_collocation", solve_osqp_collocation,
         OSQPCollocationConfig(max_iterations=10, tolerance=1e-4)),
        ("osqp_shooting", solve_osqp_shooting,
         OSQPShootingConfig(max_iterations=10, tolerance=1e-5)),
    ):
        f = jax.jit(lambda xb, s=solve, c=cfg: jax.vmap(
            lambda s0: s(spec.replace(initial_state=s0), c))(xb).cost)
        cost = f(x0)
        acc = cost[0] * 1e-12
        float(acc)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            cost = f(x0 + acc)
            acc = cost[0] * 1e-12
            float(acc)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        c = np.asarray(cost, np.float64)
        print(f"{name}: batch={batch} {batch/dt:.0f} solves/s "
              f"median_cost={np.median(c):.2f}")


def bench_ip_vs_admm():
    from multi_agent_solver_tpu.solvers.admm_qp import ADMMConfig
    from multi_agent_solver_tpu.solvers.ip_qp import solve_traj_box_qp_ip
    from multi_agent_solver_tpu.solvers.traj_qp import solve_traj_box_qp
    from tests.test_traj_qp import random_traj_qp

    rng = np.random.default_rng(5)
    qp, _ = random_traj_qp(rng, N=81, nb=6, nr=4, allow_ranged=False)
    tight = ADMMConfig(max_iterations=200000, eps_abs=1e-9, eps_rel=1e-9)
    for name, fn in (("admm", solve_traj_box_qp), ("ip", solve_traj_box_qp_ip)):
        f = jax.jit(lambda q, fn=fn: fn(q, tight))
        out = f(qp)
        jax.block_until_ready(out.w)
        t0 = time.perf_counter()
        out = f(qp)
        jax.block_until_ready(out.w)
        dt = time.perf_counter() - t0
        print(f"{name} (T=81, eps=1e-9): {dt*1e3:.1f} ms "
              f"iters={int(out.iterations)} r_prim={float(out.r_prim):.1e}")


if __name__ == "__main__":
    if os.environ.get("BENCH_QP_X64"):
        bench_ip_vs_admm()
    else:
        bench_sqp_batched(int(os.environ.get("BENCH_QP_BATCH", "1024")),
                          int(os.environ.get("BENCH_QP_REPS", "5")))
