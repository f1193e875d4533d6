#!/usr/bin/env bash
# Capture a JAX/XLA profiler trace of the batched MPC benchmark
# (the analogue of the reference's perf-record scripts/profile.sh).
#
# Usage: scripts/profile.sh [outdir]
# View the trace with TensorBoard or Perfetto (trace.json.gz inside outdir).
set -euo pipefail
cd "$(dirname "$0")/.."

OUTDIR="${1:-/tmp/mas_tpu_profile}"
python - "$OUTDIR" <<'EOF'
import sys
import jax
import jax.numpy as jnp
import numpy as np

outdir = sys.argv[1]

from __graft_entry__ import _single_track_spec
from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr

spec = _single_track_spec(dtype=jnp.float32)
config = ILQRConfig(max_iterations=10, tolerance=1e-5)
B = 4096
rng = np.random.RandomState(0)
x0 = np.zeros((B, 4), np.float32)
x0[:, 1] = rng.uniform(0.5, 1.5, B)
x0 = jnp.asarray(x0)

solve = jax.jit(jax.vmap(lambda s0: solve_ilqr(spec.replace(initial_state=s0), config)))
jax.block_until_ready(solve(x0))  # compile outside the trace

with jax.profiler.trace(outdir):
    jax.block_until_ready(solve(x0))
print(f"trace written to {outdir}")
EOF
