#!/usr/bin/env bash
# Smoke-run every example (the analogue of the reference's scripts/run.sh CI
# step: pass/fail is the exit code).
set -euo pipefail
cd "$(dirname "$0")/.."

PLATFORM="${JAX_PLATFORMS:-}"
run() {
  echo "== $* =="
  JAX_PLATFORMS="$PLATFORM" python -m "multi_agent_solver_tpu.examples.$@" | head -1
}

run single_track_ocp --solver ilqr
run pendulum_swing_up --solver ilqr
run rocket_max_altitude --solver cgd
run multi_agent_lqr --agents 3 --strategy sequential
run multi_agent_single_track --agents 4 --strategy trustregion
run single_track_mpc --steps 30
run cartpole_swing_up --solver ilqr
echo "all examples ran"
