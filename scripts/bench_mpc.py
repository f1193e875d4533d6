#!/usr/bin/env python3
"""Closed-loop MPC fleet throughput on one TPU chip.

Simulates a fleet of single-track lane-follow controllers in closed loop
(``mpc.run_mpc_batched``): every receding-horizon step is ONE fused batched
iLQR solve (warm-started from the shifted previous plan), followed by an
on-device plant step -- the entire N-step simulation is a single compiled
program.  The reference has no closed-loop driver at all (its MPC story is
``update_initial_with_best``, ocp.hpp:95-100); this benchmark measures the
framework's fleet-simulation rate:

  mpc_steps/s = fleet_size * n_steps / wall_time

Timing uses the same chained-distinct-input + host-fetch-sync methodology
as bench.py (the remote tunnel caches repeated identical calls).

Env knobs: BENCH_MPC_BATCH (default 8192), BENCH_MPC_STEPS (default 50),
BENCH_MPC_ITERS (solver iterations per step, default 5), BENCH_MPC_REPS
(default 10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(os.environ.get("BENCH_MPC_BATCH", "8192"))
    n_steps = int(os.environ.get("BENCH_MPC_STEPS", "50"))
    iters = int(os.environ.get("BENCH_MPC_ITERS", "5"))
    reps = int(os.environ.get("BENCH_MPC_REPS", "10"))

    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.mpc import run_mpc_batched
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    spec = _single_track_spec()
    config = ILQRConfig(max_iterations=iters, tolerance=1e-5)

    rng = np.random.RandomState(0)
    x0 = np.zeros((batch, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, batch)
    x0[:, 3] = rng.uniform(0.0, 0.5, batch)
    x0 = jnp.asarray(x0)

    @jax.jit
    def simulate(x0_batch):
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0_batch)
        trace = run_mpc_batched(
            specs, lambda s: solve_ilqr_batched(s, config), n_steps
        )
        return trace.states[-1], trace.costs[-1]

    xN, cN = simulate(x0)
    acc = cN[0] * 1e-12
    float(acc)                                   # sync warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        xN, cN = simulate(x0 + acc)              # chained distinct input
        acc = cN[0] * 1e-12
        float(acc)
        times.append(time.perf_counter() - t0)

    # Closed-loop sanity: the fleet must actually regulate.
    y_final = np.abs(np.asarray(xN[:, 1], np.float64))
    regulated = float(np.median(y_final))

    rates = batch * n_steps / np.asarray(times)
    out = {
        "metric": "single_track_mpc_fleet_steps_per_s_per_chip",
        "value": round(float(np.median(rates)), 1),
        "unit": "mpc_steps/s",
        "p25": round(float(np.percentile(rates, 25)), 1),
        "p75": round(float(np.percentile(rates, 75)), 1),
        "fleet": batch,
        "n_steps": n_steps,
        "solver_iterations": iters,
        "median_final_lateral_error": round(regulated, 5),
        "reps": reps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
