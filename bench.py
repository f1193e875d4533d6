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
* ``BENCH_BATCH`` defaults to 524288 (round 5; was 262144): the fixed
  ~31 ms per-call tunnel overhead (measured by chaining 1x/2x/3x solves
  inside one jit: marginal solve 273 ms, intercept 31 ms) amortizes
  further at larger batches -- measured 1.00M solves/s at 262k lanes,
  1.06M at 524k, 1.08M at 1M (knee at 524k; 1M doubles wall time for
  +2%).
* ``mfu_est`` is an *analytic* algorithmic-FLOP count divided by measured
  time over the chip's f32 matmul peak.  XLA's own cost analysis cannot
  see inside Pallas kernels (it reported 0 FLOPs for the fused path), so
  the numerator is a documented closed-form count (see _SOLVE_FLOPS) that
  deliberately undercounts (transcendentals = 1 FLOP) -- honest about this
  being a small-matrix (nx=4) VPU workload far from MXU-shaped; the
  companion ``vpu_util_est`` rates the same number against the VPU's
  ~4 TFLOP/s vector peak, which is the unit the workload actually runs on.
* ``bf16_solves_per_s`` runs the same solve with a bfloat16 spec (the
  fast-path dtype SURVEY section 7 asked to benchmark separately); emitted
  only when the bf16 costs stay finite and near the f32 answers.

* The solver runs the short forward-pass ladder ``(1, 1/2, 1/8)``
  (``ILQRConfig.alpha_ladder``): profiling put the 10-candidate reference
  ladder's select kernel at 65% of device time while every lane accepted
  alpha in {1, 1/2} -- with the short ladder the converged cost
  distribution is BIT-IDENTICAL at this batch (median 157.19426,
  p99 436.50748, max 499.59595 under both ladders; asserted on CPU in
  tests/test_fused_loop.py) and throughput rises ~1.45x.  The acceptance
  rule itself (largest improving candidate, monotone merit) is unchanged.

* The fused kernels run with the auto lane fold (``ILQRConfig.lane_fold``):
  8 batch tiles folded into the sublane axis of every kernel block, so
  each op in the sequential time-grid kernels covers 8 independent vector
  registers.  Bit-identical results (tests/test_fused_loop.py), measured
  441.9k -> 681.0k solves/s at this batch (docs/BENCHMARKS.md).

* Cost-structure hoisting (round 4, auto-detected since round 5): the
  lane-follow stage cost ``10 y^2 + (v-1)^2 + 0.1(delta^2 + a^2)`` is
  quadratic with fixed weights, so its Hessian stacks are trajectory- AND
  time-invariant -- discovered by the trace-time Hessian probe
  (``resolve_cost_structure``), no flags needed.
  The fused path hoists them out of the iteration loop (the linearize
  kernel skips the nested-jvp Hessian chains and 28 of its 58 output tiles
  per stage) and the Riccati kernel reads ONE Hessian block per batch row
  instead of per (row, stage) -- pure strength reduction, bit-identical
  costs and controls (asserted in tests/test_fused_loop.py; the reference
  example likewise supplies analytic constant cost derivatives,
  single_track_ocp.cpp:41-66).  Measured 685k -> 804k solves/s here.

* The stationary path linearizes INSIDE the Riccati kernel
  (``riccati_fusedlin_pallas_tiled``): each backward grid step reads only
  (x_t, u_t) -- 6 lane tiles instead of the 30-tile A/B/lx/lu stacks --
  and the separate linearize launch disappears.  Measured A/B at 262k:
  in-kernel 876k vs separate-kernel 810k solves/s, identical costs.

* Round 5 (xplane-profiled: select kernel 14.05 / Riccati 8.05 / XLA glue
  4.2 ms of the 26.4 ms iteration at 262k lanes): the select kernel now
  (a) outputs the trajectory in STAGE layout with in-kernel accept/freeze
  masking, deleting the loop body's concat-shift and full-stack
  jnp.where passes, and (b) writes in place over the reference buffers
  (input_output_aliases), deleting the while-carry copy pass.  The
  select kernel also processes 2 time steps per grid step
  (``time_unroll`` auto).  Identical per-lane results (CPU equivalence
  suite + the exact 157.19426/436.50748/499.59595 cost distribution on
  the chip); full-result solve 353.5 -> 262 ms at 262k lanes.

  (A fixed-trip loop variant ``early_exit=0`` was also measured on the
  theory that the while predicate forces per-iteration host round trips
  through the tunnel: no effect, 860k vs 876k -- the while_loop is fine on
  this platform, so the default data-dependent early exit stays.)

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
# 197 TFLOP/s bf16, f32 at half rate.  The VPU (8x128 vector unit) peak is
# ~4 TFLOP/s f32 -- the relevant roofline for nx=4 lane-resident math.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = V5E_PEAK_BF16 / 2
V5E_PEAK_VPU = 4e12


def _solve_flops(T=80, iters=10, nx=4, nu=2, n_alphas=3):
    """Analytic FLOPs per single-track iLQR solve (deliberate undercount).

    Components (transcendentals counted as 1 FLOP, so this is a floor):
    dynamics eval ~8; RK4 step = 4 evals + combine ~56; linearize stage =
    jvp in (nx+nu) directions through the step (~2x each) + cost
    grads/Hessians ~750; Riccati stage = small-matrix Q-terms, 16-level
    regularization ladder, 2x2 solves, value recursion ~650; forward
    select = n_alphas scored rollouts + 1 winner re-roll, each T stages of
    (step + feedback + clamp + stage cost) ~86/stage.
    """
    f_dyn = 8
    f_step = 4 * f_dyn + 6 * nx
    f_lin = (nx + nu) * 2 * f_step + 80
    f_riccati = 650
    f_fwd_stage = f_step + 2 * nx * nu + 2 * nu + 10
    per_iter = T * (f_lin + f_riccati) + (n_alphas + 1) * T * f_fwd_stage
    rollout0 = T * f_step
    return iters * per_iter + rollout0


def _solve_transcendentals(T=80, iters=10, n_alphas=3):
    """Transcendental evaluations per solve (cos/sin/tan of the bicycle
    dynamics: 3 per dynamics eval, 4 evals per RK4 step).

    Counted assuming the compiler CSEs the repeated primal inside the
    Riccati kernel's 6 jvp chains (tangents of sin/cos/tan reuse the
    primal's sin/cos/tan).  Measured cost on this chip (2026-08-20
    micro-bench, XLA lowering): one transcendental ~= 28.6 chained fma
    ~= 57 flops of VPU issue -- the dominant term of the fused path's
    roofline (docs/BENCHMARKS.md "Roofline").
    """
    per_step = 4 * 3                                  # one RK4 step
    per_iter = (n_alphas + 1) * T * per_step + T * per_step
    return iters * per_iter + T * per_step


# Measured Mosaic/Pallas marginal cost of one sin/cos/tan in chained-fma
# equivalents (fori_loop chains, overhead differenced out, 2026-08-20:
# fma 874 Gelem/s, sin 35.8, tan 31.0 -> ~24-28x; see docs/BENCHMARKS.md
# "Roofline").  Priced SERIALLY -- the VPU co-issues transcendental
# chains with surrounding arithmetic, so a load estimate > 1.0 means the
# kernels are saturating the multi-issue limit, not that the model is
# broken.
TRANSC_FMA_EQUIV = 25.0


def _build(spec_dtype, batch):
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    spec = _single_track_spec(dtype=spec_dtype)
    # No cost-structure flags (round 5): the lane-follow cost's quadratic +
    # stationary structure is AUTO-DETECTED by the trace-time Hessian probe
    # (solvers/ilqr.py resolve_cost_structure), so this benchmark measures
    # the default solve path, not a hand-tuned configuration.
    config = ILQRConfig(max_iterations=10, tolerance=1e-5,
                        alpha_ladder=(1.0, 0.5, 0.125))

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

    Round-5 fix: the perturbation must actually FLIP INPUT BITS -- the old
    ``cost[0] * 1e-12`` (~1.6e-10) was below the f32 ulp of the ~1.0-scale
    inputs, so every rep's input was bitwise identical and the anti-cache
    defense was void.  The floor is dtype-aware (bf16 ulp at 1.0 is
    ~0.004) and still solve-chained so reps cannot be reordered.
    """
    eps_floor = 1e-2 if x0.dtype == jnp.bfloat16 else 1e-5
    result = solve_batch(x0)
    acc = result.cost[0] * 1e-9 + eps_floor
    float(acc)                             # sync the warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        result = solve_batch(x0 + acc)     # chained distinct input
        acc = result.cost[0] * 1e-9 + eps_floor
        float(acc)                         # sync this rep
        times.append(time.perf_counter() - t0)
    return np.asarray(times), result


def main():
    batch = int(os.environ.get("BENCH_BATCH", "524288"))
    reps = int(os.environ.get("BENCH_REPS", "20"))

    solve_batch, x0 = _build(jnp.float32, batch)
    times, result = _time_reps(solve_batch, x0, reps)
    rates = batch / times
    median = float(np.median(rates))
    p25, p75 = (float(np.percentile(rates, q)) for q in (25, 75))

    flops = _solve_flops() * batch
    achieved = flops / float(np.median(times))
    mfu = round(achieved / V5E_PEAK_F32, 5)
    vpu_util = round(achieved / V5E_PEAK_VPU, 4)
    # Serial-priced VPU issue load: (plain flops + measured ~25 fma-equiv
    # per transcendental) / wall, against the serial chained-fma rate.
    # The undercount model (vpu_util_est) treats sin/cos/tan as 1 flop
    # and so reads low on this transcendental-dominated workload; this
    # one reads HIGH (> 1.0 = the kernels co-issue transcendental chains
    # with surrounding arithmetic -- the VPU is saturated at fixed
    # algorithm + precision; see docs/BENCHMARKS.md "Roofline").
    flops_eq = flops + _solve_transcendentals() * batch * TRANSC_FMA_EQUIV * 2.0
    vpu_load_serial = round(
        flops_eq / float(np.median(times)) / V5E_PEAK_VPU, 4
    )

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
        "vpu_util_est": vpu_util,
        "vpu_load_serial_est": vpu_load_serial,
        "bf16_solves_per_s": bf16_rate,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
