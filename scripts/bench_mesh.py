#!/usr/bin/env python3
"""Weak-scaling benchmark over a device mesh (BASELINE.md's >=80% target).

Holds the PER-DEVICE batch constant while growing the data-axis device
count (1, 2, 4, ... up to the full mesh) and reports solves/s plus the
scaling efficiency vs the single-device rate.  The solve is the headline
batched single-track iLQR MPC (bench.py problem) sharded with
``mesh_batch_solve_fast`` (shard_map over the ``data`` axis; batch lanes
are independent, so perfect weak scaling = flat per-device rate).

Runs unchanged on:

* the virtual CPU mesh used for CI/dev validation::

      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python scripts/bench_mesh.py --per-device-batch 256 --iters 5 \
          --horizon 40 --json MESHBENCH.json

* a single real TPU host (device counts limited to the local chips);
* a multi-host TPU pod -- launch one process per host with the SAME
  command line plus the coordinator flags (see docs/MULTIHOST.md)::

      python scripts/bench_mesh.py --per-device-batch 65536 \
          --coordinator 10.0.0.1:8476 --num-processes 4 --process-id $ID

  Process-local shards are assembled with
  ``jax.make_array_from_process_local_data``, so no host ever
  materializes the global batch.

The timing methodology matches bench.py: chained distinct inputs (each
rep's perturbation derives from the previous rep's output) plus an
explicit host fetch, defeating the remote-tunnel result cache
(docs/BENCHMARKS.md "Timing methodology").

**Reading virtual-mesh numbers honestly:** on the CPU validation mesh the
N "devices" share this host's physical cores, so aggregate throughput is
structurally capped at ~cores x the single-device rate -- plain weak-scaling
efficiency is bounded by cores/N no matter how good the partitioning is
(e.g. 8 virtual devices on a 4-core host can never exceed 50%).  The
artifact therefore also reports ``efficiency_vs_cores`` = rate /
(rate_1 * min(N, physical_cores)), which isolates the partitioning +
collective overhead this environment CAN measure from the compute the
host simply does not have.  On a real TPU mesh every device is real
hardware and the two metrics coincide (min(N, cores) clamps to N via
``devices_are_virtual = False``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    _flags = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()
# Virtual-mesh honesty (round 5, measured): with multi-threaded eigen each
# of the N concurrent device programs fans its ops across ALL host cores,
# so at N = cores the 4 programs x ~2 intra-op threads oversubscribe the
# host and aggregate throughput COLLAPSES below the N=2 point (measured
# 527 vs 915 solves/s at production shape).  Single-threaded eigen makes
# one virtual device = one core's compute -- the configuration the
# efficiency_vs_cores normalization assumes -- and restores the ceiling
# (926 solves/s at N=4 = 93% of 4x the pinned 1-core rate).  Real TPU
# meshes are unaffected (CPU-backend flag only).
if ("--xla_force_host_platform_device_count" in _flags
        and "--xla_cpu_multi_thread_eigen" not in _flags):
    _flags = f"{_flags} --xla_cpu_multi_thread_eigen=false"
os.environ["XLA_FLAGS"] = _flags

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--per-device-batch", type=int, default=32768,
                    help="batch lanes PER DEVICE (held constant while scaling)")
    ap.add_argument("--device-counts", type=int, nargs="*", default=None,
                    help="data-axis sizes to measure (default: powers of 2 "
                         "up to the device count)")
    ap.add_argument("--horizon", type=int, default=80)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--json", default=None, help="write the artifact here")
    # Multi-host (pod) flags -- forwarded to jax.distributed.initialize.
    ap.add_argument("--coordinator", default=None,
                    help="coordinator_address host:port (multi-host only)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    if args.coordinator is not None:
        from multi_agent_solver_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    devices = jax.devices()
    n_dev = len(devices)
    # Virtual CPU mesh (xla_force_host_platform_device_count): the devices
    # share this host's cores, which bounds honest weak scaling (see
    # module docstring).
    devices_are_virtual = jax.default_backend() == "cpu"
    # Real PHYSICAL core count (ADVICE r4: os.cpu_count() returns logical
    # CPUs incl. SMT threads, which would skew the efficiency cap on a
    # hyperthreaded host).  psutil when present; logical count + explicit
    # flag otherwise.
    try:
        import psutil

        physical_cores = psutil.cpu_count(logical=False) or os.cpu_count() or 1
        cores_are_logical = psutil.cpu_count(logical=False) is None
    except ImportError:  # pragma: no cover
        physical_cores = os.cpu_count() or 1
        cores_are_logical = True
    counts = args.device_counts
    if not counts:
        counts, n = [], 1
        while n <= n_dev:
            counts.append(n)
            n *= 2
    counts = [c for c in counts if c <= n_dev]

    spec = _single_track_spec(horizon=args.horizon)
    config = ILQRConfig(max_iterations=args.iters, tolerance=1e-5,
                        alpha_ladder=(1.0, 0.5, 0.125))
    solve = lambda s: solve_ilqr_batched(s, config)

    def build_specs(batch, mesh):
        """Batched spec sharded over the mesh's data axis.

        Multi-process: each process constructs only ITS shard rows and
        contributes them via make_array_from_process_local_data; single
        process: plain device_put through shard_specs.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = np.random.RandomState(0)
        x0 = np.zeros((batch, 4), np.float32)
        x0[:, 1] = rng.uniform(0.5, 1.5, batch)
        x0[:, 3] = rng.uniform(0.0, 0.5, batch)

        def vspec(x0b):
            return jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0b)

        if jax.process_count() > 1:
            sharding = NamedSharding(mesh, P(DATA_AXIS))
            rows_per_proc = batch // jax.process_count()
            lo = jax.process_index() * rows_per_proc
            local = x0[lo:lo + rows_per_proc]
            x0_global = jax.make_array_from_process_local_data(
                sharding, local, global_shape=(batch, 4)
            )
            return vspec(x0_global)
        return vspec(jnp.asarray(x0))

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def pin_cores(n):
        """Virtual-mesh honesty (round 5, measured): restrict the process to
        min(n, cores) cores so N virtual devices model N single-core chips.

        Without this, XLA:CPU fans EACH device program across the whole
        host (a 1-device run measured 480 solves/s on 2+ cores vs 248
        pinned to one), so rate_1 is not a per-core rate and the
        efficiency normalization is skewed both ways: N=1 looks too fast,
        N=cores pays oversubscription (measured 527 vs 926 solves/s at
        N=4 production shape before the eigen flag + pinning).  With
        pinning, ideal aggregate at N <= cores is exactly N x rate_1."""
        if not devices_are_virtual or not hasattr(os, "sched_setaffinity"):
            return
        avail = sorted(_initial_affinity)
        mask = set(avail[: max(1, min(n, len(avail)))])
        # sched_setaffinity(0, ...) pins only the CALLING thread; XLA's
        # pool threads (spawned at client init with full affinity) must be
        # pinned individually or the rows are half-pinned (measured: an
        # N=1 row read 199/s with only the main thread pinned vs 248/s
        # with every thread on one core).
        try:
            tids = [int(t) for t in os.listdir("/proc/self/task")]
        except OSError:  # pragma: no cover
            tids = [0]
        for tid in tids:
            try:
                os.sched_setaffinity(tid, mask)
            except OSError:  # pragma: no cover
                pass

    _initial_affinity = (
        os.sched_getaffinity(0) if hasattr(os, "sched_getaffinity") else set()
    )

    rows = []
    rate1 = None
    for n in counts:
        pin_cores(n)
        mesh = make_mesh(n_data=n, n_agent=1, devices=devices[:n])
        batch = args.per_device_batch * n
        specs = build_specs(batch, mesh)

        # One jitted callable per mesh (mesh_batch_solve_fast's body); the
        # timing loop reuses it so reps measure execution, not retracing.
        jitted = jax.jit(shard_map(
            solve, mesh=mesh, in_specs=(P(DATA_AXIS),), out_specs=P(DATA_AXIS),
            check_vma=False,
        ))

        # Chained-input sync scalar: a GLOBAL reduction (psum across the
        # sharded axis -> replicated), so it is addressable -- and identical
        # -- on every process.  Indexing ``cost[0]`` would only be
        # addressable on the process holding shard 0.
        sync = jax.jit(lambda r: jnp.sum(r.cost) * 1e-15)

        result = jitted(specs)
        acc = sync(result)
        float(acc)  # sync warmup/compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            result = jitted(
                specs.replace(initial_state=specs.initial_state + acc)
            )
            acc = sync(result)
            float(acc)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        rate = batch / t
        if rate1 is None:
            rate1 = rate / n  # per-device baseline from the first count
        eff = rate / (rate1 * n)
        # Compute-normalized efficiency: ideal aggregate on a virtual mesh
        # is capped by the host's physical cores (the N "devices" are
        # timeshares of the same silicon); on real device meshes the cap
        # clamps to N and this equals plain efficiency.
        cap = min(n, physical_cores) if devices_are_virtual else n
        eff_cores = rate / (rate1 * cap)
        rows.append({
            "devices": n, "batch": batch, "solves_per_s": round(rate, 1),
            "per_device": round(rate / n, 1), "efficiency": round(eff, 4),
            "efficiency_vs_cores": round(eff_cores, 4),
            # jitted: a global median over a cross-process-sharded array
            # must run as a collective program, not host-side indexing.
            "median_cost": round(float(jax.jit(jnp.median)(result.cost)), 5),
        })
        print(f"devices={n:>3} batch={batch:>8} {rate:>12,.0f} solves/s "
              f"({rate / n:,.0f}/device, eff {eff:.1%}, "
              f"vs-cores {eff_cores:.1%})")

    artifact = {
        "metric": "mesh_weak_scaling_single_track_ilqr",
        "backend": jax.default_backend(),
        "per_device_batch": args.per_device_batch,
        "horizon": args.horizon,
        "iters": args.iters,
        "reps": args.reps,
        "process_count": jax.process_count(),
        "devices_are_virtual": devices_are_virtual,
        "physical_cores": physical_cores,
        "cores_are_logical": cores_are_logical,
        "rows": rows,
        "min_efficiency": min(r["efficiency"] for r in rows) if rows else None,
        "min_efficiency_vs_cores": (
            min(r["efficiency_vs_cores"] for r in rows) if rows else None
        ),
        "target": 0.8,
        # Explicit verdict (ADVICE r4: a sub-target metric must not hide
        # behind prose): pass = every row's compute-normalized efficiency
        # meets the target.
        "pass": bool(
            rows and min(r["efficiency_vs_cores"] for r in rows) >= 0.8
        ),
        "note": (
            "virtual CPU mesh: each row pins the process to min(N, {c}) "
            "cores (single-threaded eigen), so N virtual devices model N "
            "single-core chips and ideal aggregate at N <= {c} is N x "
            "rate_1; beyond {c} cores the min(N, cores) cap applies "
            "(efficiency_vs_cores; coincides with plain efficiency on "
            "real device meshes)".format(c=physical_cores)
            if devices_are_virtual else None
        ),
    }
    print(json.dumps(artifact))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
