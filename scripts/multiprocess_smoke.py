#!/usr/bin/env python3
"""True multi-process ``jax.distributed`` smoke test (CPU backend).

Round-2 review flagged that :func:`multi_agent_solver_tpu.parallel.mesh.
initialize_distributed` had never actually run multi-process -- the sharded
path was validated only on a single-process 8-device virtual mesh.  This
script launches N real OS processes (default 2), each owning ONE virtual
CPU device, forms the coordination service through
``initialize_distributed``, builds a global ``(data,)``-sharded batch with
``jax.make_array_from_process_local_data`` (each process contributes only
its own rows), runs the fused batched iLQR solve SPMD via ``shard_map``,
and cross-checks:

* the globally reduced total cost (``jnp.sum`` over the sharded axis --
  XLA inserts the cross-process psum over gloo) is bit-identical on every
  process, and
* it matches a plain single-process solve of the same batch to f32
  tolerance (run by the launcher before spawning).

Usage (no arguments needed)::

    python scripts/multiprocess_smoke.py             # launcher, spawns 2
    python scripts/multiprocess_smoke.py --num-processes 4

The launcher exits 0 only if every worker validated.  CI-safe: pure CPU,
~20 s.  The same ``initialize_distributed`` call path is what a real TPU
pod launch uses (docs/MULTIHOST.md); here it is exercised against the
gloo CPU collectives backend.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH_PER_PROC = 128
HORIZON = 40
ITERS = 5


def build_x0(batch):
    import numpy as np

    rng = np.random.RandomState(0)
    x0 = np.zeros((batch, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, batch)
    x0[:, 3] = rng.uniform(0.0, 0.5, batch)
    return x0


def solve_config():
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig

    return ILQRConfig(max_iterations=ITERS, tolerance=1e-5,
                      alpha_ladder=(1.0, 0.5, 0.125))


def worker(args) -> int:
    # This environment's jax build hardwires platforms to "axon,cpu" and
    # IGNORES the JAX_PLATFORMS env var -- pin CPU via config before any
    # backend initializes, or the worker hangs trying to reach the TPU
    # tunnel (see tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")
    from multi_agent_solver_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == args.num_processes, (
        f"process_count {jax.process_count()} != {args.num_processes}"
    )
    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from multi_agent_solver_tpu.solvers.ilqr import solve_ilqr_batched

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n_proc = jax.process_count()
    mesh = make_mesh(n_data=n_proc, n_agent=1)
    batch = BATCH_PER_PROC * n_proc

    # Each process materializes ONLY its own rows of the global batch.
    x0 = build_x0(batch)
    lo = jax.process_index() * BATCH_PER_PROC
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    x0_global = jax.make_array_from_process_local_data(
        sharding, x0[lo:lo + BATCH_PER_PROC], global_shape=(batch, 4)
    )

    spec = _single_track_spec(horizon=HORIZON)
    config = solve_config()
    specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0_global)

    solve = lambda s: solve_ilqr_batched(s, config)
    jitted = jax.jit(shard_map(
        solve, mesh=mesh, in_specs=(P(DATA_AXIS),), out_specs=P(DATA_AXIS),
        check_vma=False,
    ))
    result = jitted(specs)

    # Global reduction over the sharded axis -> replicated scalar: the
    # cross-process collective (gloo on CPU, ICI/DCN on a pod).
    total = float(jax.jit(jnp.sum)(result.cost))
    local_sum = float(sum(
        float(s.data.sum()) for s in result.cost.addressable_shards
    ))
    print(json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "total_cost": total,
        "local_shard_sum": round(local_sum, 3),
        "expected_total": args.expected_total,
    }), flush=True)
    if args.expected_total is not None:
        rel = abs(total - args.expected_total) / max(1.0, abs(args.expected_total))
        assert rel < 1e-5, f"distributed total {total} != single-process " \
                           f"{args.expected_total} (rel {rel:.2e})"
    return 0


def launcher(args) -> int:
    # Single-process reference value for the identical global batch.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _single_track_spec
    from multi_agent_solver_tpu.solvers.ilqr import solve_ilqr_batched

    batch = BATCH_PER_PROC * args.num_processes
    spec = _single_track_spec(horizon=HORIZON)
    specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(
        jnp.asarray(build_x0(batch))
    )
    expected = float(jnp.sum(solve_ilqr_batched(specs, solve_config()).cost))
    print(f"[launcher] single-process total cost: {expected:.4f}", flush=True)

    port = args.port
    procs = []
    env_base = {
        k: v for k, v in os.environ.items() if not k.startswith("JAX_PLATFORM")
    }
    for pid in range(args.num_processes):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            "--xla_cpu_prefer_vector_width=128 "
            "--xla_force_host_platform_device_count=1"
        )
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(args.num_processes),
            "--process-id", str(pid),
            "--expected-total", repr(expected),
        ]
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO))
    rc = 0
    for pid, p in enumerate(procs):
        code = p.wait()
        if code != 0:
            print(f"[launcher] worker {pid} FAILED rc={code}", file=sys.stderr)
            rc = 1
    print(f"[launcher] {'ok' if rc == 0 else 'FAILED'} "
          f"({args.num_processes} processes)", flush=True)
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--expected-total", type=float, default=None)
    args = ap.parse_args(argv)
    if args.process_id is not None:
        return worker(args)
    return launcher(args)


if __name__ == "__main__":
    raise SystemExit(main())
