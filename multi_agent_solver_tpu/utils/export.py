"""Export compiled solve programs for the native (C++) serving runtime.

Produces everything ``native/mas_serve`` needs to run a solve with zero
Python in the loop:

* ``<prefix>.mlir``               -- the jitted function lowered to StableHLO
* ``<prefix>.compile_options.pb`` -- serialized xla CompileOptionsProto
* ``<prefix>.meta.json``          -- input/output shapes and dtypes

The MLIR is portable: any PJRT plugin (``libtpu.so`` on a real TPU host, the
tunneled plugin in this environment) compiles and executes it through the
PJRT C API.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import numpy as np

from ..types import Array


def _spec_of(x) -> dict:
    x = jax.api_util.shaped_abstractify(x) if not hasattr(x, "shape") else x
    return {"shape": list(x.shape), "dtype": str(np.dtype(x.dtype))}


def export_stablehlo(
    fn: Callable,
    example_args: Sequence[Any],
    path_prefix: str,
    num_replicas: int = 1,
    num_partitions: int = 1,
) -> dict:
    """Lower ``jit(fn)(*example_args)`` to StableHLO and write the artifact
    triple next to ``path_prefix``.  Returns the metadata dict."""
    from jax._src.lib import xla_client as xc

    prefix = Path(path_prefix)
    prefix.parent.mkdir(parents=True, exist_ok=True)

    lowered = jax.jit(fn).lower(*example_args)
    mlir_text = lowered.as_text(dialect="stablehlo")
    (prefix.parent / f"{prefix.name}.mlir").write_text(mlir_text)

    opts = xc.CompileOptions()
    opts.num_replicas = num_replicas
    opts.num_partitions = num_partitions
    (prefix.parent / f"{prefix.name}.compile_options.pb").write_bytes(
        opts.SerializeAsString()
    )

    flat_in, _ = jax.tree_util.tree_flatten(tuple(example_args))
    out_shape = jax.eval_shape(fn, *example_args)
    flat_out, _ = jax.tree_util.tree_flatten(out_shape)
    meta = {
        "inputs": [_spec_of(x) for x in flat_in],
        "outputs": [_spec_of(x) for x in flat_out],
    }
    (prefix.parent / f"{prefix.name}.meta.json").write_text(json.dumps(meta, indent=2))
    return meta


def export_mpc_solve(path_prefix: str, batch: int = 1024, horizon: int = 80) -> dict:
    """Export the flagship batched single-track iLQR solve: input x0 [B, 4],
    outputs (controls [B, T, nu], cost [B])."""
    import jax.numpy as jnp

    import __graft_entry__ as graft
    from ..solvers.ilqr import ILQRConfig, solve_ilqr_batched

    spec = graft._single_track_spec(horizon=horizon)
    config = ILQRConfig(max_iterations=10, tolerance=1e-5)

    def solve(x0_batch):
        specs = jax.vmap(lambda x0: spec.replace(initial_state=x0))(x0_batch)
        result = solve_ilqr_batched(specs, config)
        return result.controls, result.cost

    example = (jnp.zeros((batch, 4), jnp.float32),)
    return export_stablehlo(solve, example, path_prefix)
