#!/usr/bin/env python3
"""MPPI throughput and quality on the TPU (VERDICT r4 item 5).

The MPPI module's thesis (solvers/mppi.py:1-12) is that a sampling solver
maps *best* onto the TPU execution model: every iteration is K independent
full-horizon rollouts -- pure data parallelism, no line search, no
factorization.  This script measures that claim on the headline
single-track problem against the iLQR baseline:

* ``solves/s`` for batched MPPI at K in {64, 256, 1024} sample rollouts,
  batch-lane scaling (vmapped lanes, like bench.py);
* solution quality at matched wall budgets: the median converged cost vs
  the iLQR distribution (median 157.19 at 10 iterations);
* the iLQR row measured identically for an apples-to-apples table.

Timing methodology matches bench.py (chained distinct inputs with a
dtype-aware bit-flipping floor + host-fetch sync, see
docs/BENCHMARKS.md "Timing methodology").

Usage: python scripts/bench_mppi.py [--batch 4096] [--reps 8] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=4096,
                    help="independent problem lanes (vmapped)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30,
                    help="MPPI iterations per solve")
    ap.add_argument("--samples", type=int, nargs="*", default=[64, 256, 1024])
    ap.add_argument("--json", default=None)
    return ap.parse_args(argv)


def _time(fn, x0, reps):
    j = jax.jit(fn)
    out = j(x0)
    get = lambda o: jnp.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    acc = get(out) * 1e-9 + 1e-5
    float(acc)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = j(x0 + acc)
        acc = get(out) * 1e-9 + 1e-5
        float(acc)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main(argv=None) -> int:
    args = parse_args(argv)
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched
    from multi_agent_solver_tpu.solvers.mppi import MPPIConfig, solve_mppi

    B = args.batch
    spec = _single_track_spec(dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x0 = np.zeros((B, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, B)
    x0[:, 3] = rng.uniform(0.0, 0.5, B)
    x0 = jnp.asarray(x0)

    rows = []

    # iLQR baseline (same config as bench.py).
    ilqr_cfg = ILQRConfig(max_iterations=10, tolerance=1e-5,
                          alpha_ladder=(1.0, 0.5, 0.125))

    def ilqr_run(xb):
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(xb)
        return solve_ilqr_batched(specs, ilqr_cfg)

    t, out = _time(ilqr_run, x0, args.reps)
    c = np.asarray(out.cost, np.float64)
    rows.append({
        "solver": "ilqr", "K": None, "iters": 10, "batch": B,
        "solves_per_s": round(B / t, 1), "time_ms": round(t * 1e3, 2),
        "median_cost": round(float(np.median(c)), 5),
        "p99_cost": round(float(np.percentile(c, 99)), 5),
    })
    print(f"ilqr           {B / t:>12,.0f} solves/s  median cost "
          f"{np.median(c):.3f}  p99 {np.percentile(c, 99):.3f}")

    for K in args.samples:
        cfg = MPPIConfig(max_iterations=args.iters, tolerance=0.0,
                         num_samples=K, sigma=0.3, temperature=0.2)

        def mppi_run(xb, cfg=cfg):
            specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(xb)
            return jax.vmap(lambda s: solve_mppi(s, cfg))(specs)

        t, out = _time(mppi_run, x0, args.reps)
        c = np.asarray(out.cost, np.float64)
        rows.append({
            "solver": "mppi", "K": K, "iters": args.iters, "batch": B,
            "solves_per_s": round(B / t, 1), "time_ms": round(t * 1e3, 2),
            "median_cost": round(float(np.median(c)), 5),
            "p99_cost": round(float(np.percentile(c, 99)), 5),
        })
        print(f"mppi K={K:<5d}   {B / t:>12,.0f} solves/s  median cost "
              f"{np.median(c):.3f}  p99 {np.percentile(c, 99):.3f}")

    artifact = {
        "metric": "mppi_vs_ilqr_single_track",
        "backend": jax.default_backend(),
        "batch": B, "reps": args.reps, "rows": rows,
    }
    print(json.dumps(artifact))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
