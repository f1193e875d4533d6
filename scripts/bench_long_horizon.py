#!/usr/bin/env python3
"""Long-horizon fused-solve benchmark (VERDICT r4 item 9 / round-5 row).

Runs the WHOLE fused iLQR solve (not just kernels) on the headline
lane-follow problem at long horizons and reports solves/s plus
stage-solves/s (solves/s x T) -- the per-stage rate is the honest unit
for comparing different T, since per-solve work scales with T.

Measured 2026-08-20 (one v5e chip, docs/BENCHMARKS.md "Long-horizon
proof point"): T=80 -> 85.4M stage-solves/s, T=512 -> 103.1M,
T=1024 -> 115.6M: per-stage throughput RISES with T because fixed
per-iteration costs amortize over the longer sequential grid.

Usage: python scripts/bench_long_horizon.py [--pairs 512:16384 1024:8192]
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
    ap.add_argument("--pairs", nargs="*", default=["512:16384", "1024:8192"],
                    help="T:batch pairs to measure")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", default=None)
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    rows = []
    for pair in args.pairs:
        T, B = (int(v) for v in pair.split(":"))
        spec = _single_track_spec(dtype=jnp.float32, horizon=T)
        rng = np.random.RandomState(0)
        x0 = np.zeros((B, 4), np.float32)
        x0[:, 1] = rng.uniform(0.5, 1.5, B)
        x0[:, 3] = rng.uniform(0.0, 0.5, B)
        x0 = jnp.asarray(x0)
        config = ILQRConfig(max_iterations=10, tolerance=1e-5,
                            alpha_ladder=(1.0, 0.5, 0.125))

        @jax.jit
        def solve(xb, spec=spec, config=config):
            specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(xb)
            return solve_ilqr_batched(specs, config).cost

        # Chained-input timing (see docs/BENCHMARKS.md "Timing methodology").
        out = solve(x0)
        acc = out[0] * 1e-7
        float(acc)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = solve(x0 + acc)
            acc = out[0] * 1e-7
            float(acc)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        c = np.asarray(out, np.float64)
        row = {
            "horizon": T, "batch": B, "time_ms": round(t * 1e3, 1),
            "solves_per_s": round(B / t, 1),
            "stage_solves_per_s": round(B * T / t, 1),
            "median_cost": round(float(np.median(c)), 5),
            "all_finite": bool(np.isfinite(c).all()),
        }
        rows.append(row)
        print(f"T={T:<5d} B={B:<7d} {row['solves_per_s']:>12,.0f} solves/s  "
              f"{row['stage_solves_per_s'] / 1e6:>8.1f}M stage-solves/s  "
              f"median cost {row['median_cost']:.3f}")

    artifact = {"metric": "long_horizon_fused_ilqr",
                "backend": jax.default_backend(), "rows": rows}
    print(json.dumps(artifact))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
