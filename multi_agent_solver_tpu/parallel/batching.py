"""Batched solving: vmap over problem instances (single chip).

The reference solves one problem per process; the TPU framework's central
scaling primitive is solving THOUSANDS of problem instances per chip as batch
lanes of one compiled program -- the "solves/s/chip" benchmark axis
(BASELINE.md).  A batch is expressed as an :class:`OCPSpec` whose array
leaves carry a leading batch axis (functions/dims stay shared).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ocp import OCPSpec
from ..solvers.base import SolveResult


def replicate_spec(spec: OCPSpec, batch: int) -> OCPSpec:
    """Tile every leaf of ``spec`` along a new leading batch axis."""
    return jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf, (batch,) + leaf.shape), spec
    )


def batch_spec_over(spec: OCPSpec, **leaf_batches) -> OCPSpec:
    """Batch a spec by overriding selected leaves with batched arrays.

    Example::

        specs = batch_spec_over(spec, initial_state=x0_batch)   # [B, nx]

    Non-overridden leaves broadcast to the batch size.
    """
    sizes = {v.shape[0] for v in leaf_batches.values()}
    if len(sizes) != 1:
        raise ValueError(f"inconsistent batch sizes: {sizes}")
    batch = sizes.pop()
    specs = replicate_spec(spec, batch)
    return specs.replace(**leaf_batches)


def batch_solve(
    solve_fn: Callable[[OCPSpec], SolveResult],
    specs: OCPSpec,
    donate: bool = False,
) -> SolveResult:
    """Solve a batched spec: ``jit(vmap(solve_fn))`` over the leading axis."""
    fn = jax.vmap(solve_fn)
    fn = jax.jit(fn, donate_argnums=(0,) if donate else ())
    return fn(specs)
