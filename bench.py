"""Benchmark: batched single-track iLQR MPC solves/s on one TPU chip.

Prints ONE JSON line with the headline metric plus dispersion and
efficiency diagnostics (VERDICT r1 item 9):

  {"metric": ..., "value": <median solves/s>, "unit": "solves/s",
   "vs_baseline": ..., "median": ..., "p25": ..., "p75": ...,
   "reps": ..., "mfu_est": ..., "bf16_solves_per_s": ...}

* ``value`` is the MEDIAN over ``BENCH_REPS`` (default 20) individually
  timed repetitions -- the remote-TPU tunnel has ~20% run-to-run variance,
  so a single mean of 5 was a roll of the dice.  Each rep perturbs the
  input with a scalar chained from the previous rep's output and syncs via
  a host fetch (see _time_reps; repeated identical calls can be served
  from a tunnel-side cache without executing).
* ``BENCH_BATCH`` defaults to 32768: an honest chained-input batch sweep
  shows throughput rising monotonically to ~150k solves/s at 256k lanes
  (92k at 8k) -- large batches amortize the per-call tunnel overhead; 32k
  is the knee.
* ``mfu_est`` is XLA's own cost-analysis FLOP count divided by measured
  time over the chip's f32 peak -- an *estimate*, honest about this being
  a small-matrix (nx=4) workload far from MXU-shaped.
* ``bf16_solves_per_s`` runs the same solve with a bfloat16 spec (the
  fast-path dtype SURVEY section 7 asked to benchmark separately); emitted
  only when the bf16 costs stay finite and near the f32 answers.

Baseline: the C++ reference solves this problem (nx=4, nu=2, T=80, dt=0.1,
10 iLQR iterations) in ~1.06887 ms single-threaded (reference
README.md:167), i.e. ~935.6 solves/s.
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

# Peak dense-matmul throughput of one TPU v5e chip (public spec):
# 197 TFLOP/s bf16, f32 at half rate.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = V5E_PEAK_BF16 / 2


def _build(spec_dtype, batch):
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    spec = _single_track_spec(dtype=spec_dtype)
    config = ILQRConfig(max_iterations=10, tolerance=1e-5)

    rng = np.random.RandomState(0)
    x0 = np.zeros((batch, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, batch)   # lateral offsets
    x0[:, 3] = rng.uniform(0.0, 0.5, batch)   # initial speeds
    x0 = jnp.asarray(x0, spec_dtype)

    @jax.jit
    def solve_batch(x0_batch):
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0_batch)
        return solve_ilqr_batched(specs, config)

    return solve_batch, x0


def _time_reps(solve_batch, x0, reps):
    """Per-rep wall times (s) after a warmup/compile call.

    Defensive methodology for this environment's tunneled TPU: repeated
    identical calls can be served from a tunnel-side cache without real
    execution (``block_until_ready`` returns immediately), so each rep
    perturbs the input by a scalar DERIVED FROM the previous rep's output
    (can't be deduplicated or reordered) and syncs with an explicit host
    fetch.  The fetch adds one round-trip (~3 ms) per rep -- honest in the
    pessimistic direction.
    """
    result = solve_batch(x0)
    acc = result.cost[0] * 1e-12
    float(acc)                             # sync the warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        result = solve_batch(x0 + acc)     # chained distinct input
        acc = result.cost[0] * 1e-12
        float(acc)                         # sync this rep
        times.append(time.perf_counter() - t0)
    return np.asarray(times), result


def _flops_estimate(solve_batch, x0):
    try:
        analysis = solve_batch.lower(x0).compile().cost_analysis()
        if isinstance(analysis, list):          # older jax: list per device
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32768"))
    reps = int(os.environ.get("BENCH_REPS", "20"))

    solve_batch, x0 = _build(jnp.float32, batch)
    times, result = _time_reps(solve_batch, x0, reps)
    rates = batch / times
    median = float(np.median(rates))
    p25, p75 = (float(np.percentile(rates, q)) for q in (25, 75))

    flops = _flops_estimate(solve_batch, x0)
    mfu = None
    if flops:
        mfu = round(flops / float(np.median(times)) / V5E_PEAK_F32, 5)

    f32_costs = np.asarray(result.cost, np.float64)

    # bf16 fast-path row: report only if it produces sane answers.
    bf16_rate = None
    try:
        solve_bf16, x0_bf16 = _build(jnp.bfloat16, batch)
        t_bf16, r_bf16 = _time_reps(solve_bf16, x0_bf16, max(5, reps // 2))
        c = np.asarray(r_bf16.cost, np.float64)
        if np.all(np.isfinite(c)) and np.median(np.abs(c - f32_costs) / (1 + np.abs(f32_costs))) < 0.1:
            bf16_rate = round(float(np.median(batch / t_bf16)), 1)
    except Exception:
        pass

    baseline_rate = 1000.0 / REFERENCE_MS_PER_SOLVE
    out = {
        "metric": "single_track_ilqr_mpc_solves_per_s_per_chip",
        "value": round(median, 1),
        "unit": "solves/s",
        "vs_baseline": round(median / baseline_rate, 2),
        "median": round(median, 1),
        "p25": round(p25, 1),
        "p75": round(p75, 1),
        "reps": reps,
        "batch": batch,
        "mfu_est": mfu,
        "bf16_solves_per_s": bf16_rate,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
