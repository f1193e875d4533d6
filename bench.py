"""Benchmark: batched single-track iLQR MPC solves/s on one TPU chip.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the C++ reference solves this problem (nx=4, nu=2, T=80, dt=0.1,
10 iLQR iterations) in ~1.06887 ms on an unspecified CPU (reference
README.md:167), i.e. ~935.6 solves/s single-threaded.  ``vs_baseline`` is
our solves/s/chip divided by that rate.
"""

import json
import os
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_MS_PER_SOLVE = 1.06887  # README.md:167


def main():
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    spec = _single_track_spec(dtype=jnp.float32)
    config = ILQRConfig(max_iterations=10, tolerance=1e-5)

    # 8192 measured as the throughput sweet spot on v5e (4096: ~61k/s,
    # 8192: ~68k/s, 16384: ~66k/s).
    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    rng = np.random.RandomState(0)
    x0 = np.zeros((batch, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, batch)   # lateral offsets
    x0[:, 3] = rng.uniform(0.0, 0.5, batch)   # initial speeds
    x0 = jnp.asarray(x0)

    @jax.jit
    def solve_batch(x0_batch):
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0_batch)
        return solve_ilqr_batched(specs, config)

    # Warm up / compile.
    result = solve_batch(x0)
    jax.block_until_ready(result.cost)

    # Timed runs.
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        result = solve_batch(x0)
        jax.block_until_ready(result.cost)
    elapsed = time.perf_counter() - t0

    solves_per_s = batch * iters / elapsed
    baseline_rate = 1000.0 / REFERENCE_MS_PER_SOLVE
    print(
        json.dumps(
            {
                "metric": "single_track_ilqr_mpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / baseline_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
