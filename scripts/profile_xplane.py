"""Device-time split of the fused iLQR solve from a jax.profiler xplane trace.

The isolated-kernel timings in profile_fused.py are swamped by the remote
tunnel's ~30 ms per-call floor (a full 10-iteration solve at batch 32768 is
~70 ms wall).  This tool gets the REAL split: trace one solve with
jax.profiler, parse the .xplane.pb with the tsl xplane proto (shipped in
the baked-in tensorflow wheel), and aggregate device-stream event durations
by kernel name.

Usage: B=32768 python scripts/profile_xplane.py
"""

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _single_track_spec
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

B = int(os.environ.get("B", "32768"))


def build():
    spec = _single_track_spec(dtype=jnp.float32)
    config = ILQRConfig(max_iterations=10, tolerance=1e-5,
                        alpha_ladder=tuple(float(a) for a in os.environ.get("LADDER", "1,0.5,0.125").split(",")) if os.environ.get("LADDER", "1,0.5,0.125") != "full" else None)
    rng = np.random.RandomState(0)
    x0 = np.zeros((B, 4), np.float32)
    x0[:, 1] = rng.uniform(0.5, 1.5, B)
    x0 = jnp.asarray(x0)

    full = os.environ.get("FULL", "0") == "1"

    def solve(xb):
        specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(xb)
        result = solve_ilqr_batched(specs, config)
        # FULL=1 keeps the whole SolveResult live (states/controls untile
        # included -- what bench.py measures); default keeps cost only.
        return result if full else result.cost

    return jax.jit(solve), x0


def aggregate(trace_dir):
    """Sum event durations per kernel name across TPU device-stream lines."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    totals = defaultdict(float)   # name -> total ns
    counts = defaultdict(int)
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            # Device planes are named like '/device:TPU:0'; skip host threads.
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    totals[name] += ev.duration_ps / 1e6   # ps -> us
                    counts[name] += 1
    return totals, counts


def main():
    solve, x0 = build()
    jax.block_until_ready(solve(x0))

    trace_dir = tempfile.mkdtemp(prefix="xplane_")
    with jax.profiler.trace(trace_dir):
        out = solve(x0 + 1e-6)
        jax.block_until_ready(out)

    totals, counts = aggregate(trace_dir)
    grand = sum(totals.values())
    print(f"batch={B}  total device-event time {grand / 1e3:.2f} ms "
          f"(overlapping lines may double-count)")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us / 1e3:9.2f} ms  x{counts[name]:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
