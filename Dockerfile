# Runtime image for multi_agent_solver_tpu (the analogue of the reference's
# ubuntu builder Dockerfile). CPU-only by default; on a TPU VM install the
# matching jax[tpu] wheel instead.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential cmake ninja-build \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/mas_tpu
COPY pyproject.toml README.md ./
COPY multi_agent_solver_tpu ./multi_agent_solver_tpu
COPY scripts ./scripts
COPY native ./native
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir "jax[cpu]" scipy matplotlib pytest \
    && pip install --no-cache-dir -e .

# Smoke: run the example suite on CPU (the reference image runs its examples).
ENV JAX_PLATFORMS=cpu
RUN bash scripts/run_examples.sh

CMD ["python", "-m", "multi_agent_solver_tpu.examples.single_track_ocp", "--solver", "ilqr"]
