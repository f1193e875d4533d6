#!/usr/bin/env bash
# Build and run the container image (reference analogue: run_docker.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -t multi-agent-solver-tpu .
docker run --rm multi-agent-solver-tpu "$@"
