"""Shared example scaffolding: platform setup, result line, CSV dumps."""

from __future__ import annotations

import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

# Persistent XLA compilation cache (round 5): the QP example cells spend
# ~39 s compiling and ~0.1 s executing (measured on the TPU), so every
# fresh-process run of an example re-pays the whole compile.  A measured
# warm-cache run drops the centralized-osqp LQR cell 47 s -> 16 s.  Honor
# an explicit JAX_COMPILATION_CACHE_DIR; default to a user-cache directory.
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    _cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "multi_agent_solver_tpu", "jax_cache",
    )
    try:
        os.makedirs(_cache, exist_ok=True)
        os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    except OSError:
        pass

import jax

_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and "," not in _env_platforms and _env_platforms != "axon":
    # Honor an explicit platform pin; this jax build otherwise hardwires
    # "axon,cpu" and ignores the env var.
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass


def print_available(stream=None) -> None:
    """example_utils.hpp:112-121."""
    from ..solvers import available_solver_names
    from ..strategies import available_strategy_names

    stream = stream or sys.stdout
    stream.write("Available solvers: " + " ".join(available_solver_names()) + "\n")
    stream.write("Available strategies: " + ", ".join(available_strategy_names()) + "\n")


def result_line(**fields) -> str:
    """The machine-readable result line ``solver=... cost=... time_ms=...``
    parsed by compare_solvers.py (reference: compare_solvers.py:120-134)."""
    parts = []
    for key, value in fields.items():
        if isinstance(value, float):
            parts.append(f"{key}={value:.6f}")
        else:
            parts.append(f"{key}={value}")
    return " ".join(parts)


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed_ms = (time.perf_counter() - self.t0) * 1e3
        return False


def run_main(main) -> int:
    """Example entry wrapper with the reference's error behaviour: exceptions
    print ``Error: <what>`` to stderr and exit 1 (e.g. single_track_ocp.cpp:
    166-171); SIGPIPE (output piped to ``head``) exits quietly."""
    try:
        return main()
    except BrokenPipeError:
        try:
            sys.stdout.close()
        except Exception:
            pass
        return 0
    except Exception as exc:  # noqa: BLE001 - mirror reference catch-all
        print(f"Error: {exc}", file=sys.stderr)
        print("Use --help to see available options.", file=sys.stderr)
        return 1
