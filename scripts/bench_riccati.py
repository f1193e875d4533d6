#!/usr/bin/env python3
"""Benchmark the three Riccati backward-pass backends on the default device.

Sweeps horizon T for a fixed batch and reports median kernel latency of

* ``pallas``: the fused sequential-grid kernel (ops/riccati_pallas.py) --
  time recursion on the grid axis, problems on (8, 128) lanes;
* ``assoc``:  the time-parallel associative scan (ops/riccati_assoc.py) --
  O(log T) depth of batched [T, nx, nx] matmuls (arXiv:1809.06360);
* ``scan``:   vmapped ``lax.scan`` over XLA ops (the naive baseline).

Usage: python scripts/bench_riccati.py [--batch 256] [--T 128 512 2048]
       [--nx 4] [--nu 2] [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _random_problem(seed, B, T, nx, nu):
    rng = np.random.RandomState(seed)
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    def spd(*s):
        m = rng.randn(*s, 3)
        return f32(np.einsum("...ij,...kj->...ik", m, m) * 0.1 + np.eye(s[-1]))
    # Near-identity dynamics keep long-horizon products well conditioned.
    A = f32(np.eye(nx) + 0.02 * rng.randn(B, T, nx, nx))
    return dict(
        A=A,
        Bm=f32(0.1 * rng.randn(B, T, nx, nu)),
        lx=f32(rng.randn(B, T, nx)),
        lu=f32(rng.randn(B, T, nu)),
        lxx=spd(B, T, nx),
        luu=spd(B, T, nu),
        lux=f32(0.05 * rng.randn(B, T, nu, nx)),
        vx0=f32(rng.randn(B, nx)),
        vxx0=spd(B, nx),
    )


def _time(fn, args, reps):
    """Serialized per-call wall time via chained distinct inputs.

    On this environment's tunneled TPU, ``block_until_ready`` on a repeated
    identical call can return without real execution (a tunnel-side cache
    serves it), reporting physically impossible times.  Defense: perturb one
    input each rep by a scalar DERIVED FROM the previous rep's output (so
    reps can neither be deduplicated nor reordered), and sync once at the
    end with a host fetch.  Per-call = total / reps with the pipeline
    hiding the fetch round-trip.
    """
    args = list(args)
    lx_base = args[2]
    acc = jnp.zeros((), jnp.float32)
    out = fn(*args)                       # compile + warm
    acc = out[0].reshape(-1)[0] * 1e-12
    float(acc)                            # sync the warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        args[2] = lx_base + acc           # depends on previous output
        out = fn(*args)
        acc = out[0].reshape(-1)[0] * 1e-12
    float(acc)                            # one final sync
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--T", type=int, nargs="+", default=[128, 512, 2048])
    ap.add_argument("--nx", type=int, default=4)
    ap.add_argument("--nu", type=int, default=2)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--platform", default=None,
                    help="Pin the JAX platform (this jax build ignores the "
                         "JAX_PLATFORMS env var; e.g. --platform cpu).")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from multi_agent_solver_tpu.ops.riccati_assoc import riccati_backward_assoc
    from multi_agent_solver_tpu.ops.riccati_pallas import riccati_backward_pallas
    from tests.test_pallas_riccati import _scan_backward

    interpret = jax.default_backend() == "cpu"
    pallas = jax.jit(
        lambda *a: riccati_backward_pallas(*a, interpret=interpret)
    )
    assoc = jax.jit(riccati_backward_assoc)
    scan = jax.jit(jax.vmap(_scan_backward))

    print(f"# backend={jax.default_backend()} batch={args.batch} "
          f"nx={args.nx} nu={args.nu} reps={args.reps} (median ms)")
    print(f"{'T':>6} {'pallas':>10} {'assoc':>10} {'scan':>10}")
    for T in args.T:
        p = _random_problem(0, args.batch, T, args.nx, args.nu)
        a = tuple(p.values())
        row = []
        for name, fn in (("pallas", pallas), ("assoc", assoc), ("scan", scan)):
            try:
                ms = 1e3 * _time(fn, a, args.reps)
                row.append(f"{ms:>10.2f}")
            except Exception as e:  # e.g. VMEM overflow at extreme T
                row.append(f"{'fail':>10}")
        print(f"{T:>6} {' '.join(row)}")


if __name__ == "__main__":
    main()
