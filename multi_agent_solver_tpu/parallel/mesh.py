"""Device-mesh scale-out: shard batched/multi-agent solves over TPU chips.

The reference's only parallelism is OpenMP threads over agents
(nash.hpp:45,59,66,134,200).  The TPU equivalents, in increasing scale:

* ``vmap``                 -- agents/scenarios as batch lanes within a chip
  (see :mod:`multi_agent_solver_tpu.parallel.batching`);
* ``(data, agent)`` mesh   -- this module: lanes laid out over ICI-connected
  chips with ``jax.sharding.NamedSharding``; XLA inserts collectives only at
  reductions (total-cost ``psum`` -- the analogue of the reference's
  ``omp reduction`` at nash.hpp:45,134);
* multi-host               -- the same mesh spanning hosts via
  ``jax.distributed`` (DCN between hosts, ICI within): see
  :func:`initialize_distributed`.

Because batch lanes are independent until the final cost reduction, sharding
is pure data placement: no resharding collectives appear anywhere in the hot
loop, which is what makes near-linear scaling achievable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ocp import OCPSpec
from ..solvers.base import SolveResult

DATA_AXIS = "data"
AGENT_AXIS = "agent"


def make_mesh(
    n_data: Optional[int] = None,
    n_agent: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data, agent)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_agent
    if n_data * n_agent > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_agent} needs {n_data * n_agent} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: n_data * n_agent]).reshape(n_data, n_agent)
    return Mesh(grid, (DATA_AXIS, AGENT_AXIS))


def shard_specs(specs: OCPSpec, mesh: Mesh, batch_axes: int = 1) -> OCPSpec:
    """Place a batched spec's leading axes onto the mesh.

    ``batch_axes=1``: leading axis shards over ``data``;
    ``batch_axes=2``: axes shard over ``(data, agent)`` -- the layout used by
    batched multi-agent sweeps.
    """
    axes = (DATA_AXIS, AGENT_AXIS)[:batch_axes]

    def place(leaf):
        spec_axes = axes + (None,) * (leaf.ndim - batch_axes)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec_axes)))

    return jax.tree_util.tree_map(place, specs)


def mesh_batch_solve(
    solve_fn: Callable[[OCPSpec], SolveResult],
    specs: OCPSpec,
    mesh: Mesh,
) -> SolveResult:
    """Solve a sharded batch: one jitted vmap whose operands carry mesh
    shardings; XLA partitions the whole solve SPMD across the mesh."""
    specs = shard_specs(specs, mesh, batch_axes=1)
    return jax.jit(jax.vmap(solve_fn))(specs)


def mesh_batch_solve_fast(
    batched_solve_fn: Callable[[OCPSpec], SolveResult],
    specs: OCPSpec,
    mesh: Mesh,
) -> SolveResult:
    """Shard the FUSED batched solver over the ``data`` mesh axis.

    The Pallas kernels inside ``solve_ilqr_batched`` are single-device
    programs, so each shard runs them on its local slice via ``shard_map``
    (batch lanes are independent; no collectives needed).  The batch size
    must divide by the data-axis size.

    Example::

        result = mesh_batch_solve_fast(
            lambda s: solve_ilqr_batched(s, config), specs, mesh)
    """
    try:
        from jax import shard_map  # jax >= 0.5 canonical location
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n_data = mesh.shape[DATA_AXIS]
    B = specs.initial_state.shape[0]
    if B % n_data != 0:
        raise ValueError(f"batch {B} must divide data axis {n_data}")

    specs = shard_specs(specs, mesh, batch_axes=1)
    # Every leaf shards on its leading (batch) axis; outputs likewise.
    fn = shard_map(
        batched_solve_fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS),),
        out_specs=P(DATA_AXIS),
        # pallas_call out_shapes carry no varying-mesh-axis metadata.
        check_vma=False,
    )
    return jax.jit(fn)(specs)


def mesh_multi_agent_solve(
    solve_fn: Callable[[OCPSpec], SolveResult],
    specs: OCPSpec,
    mesh: Mesh,
):
    """Solve a ``[B, N_agents]`` grid of OCPs sharded over ``(data, agent)``
    and return (result, total_cost_per_batch).

    The sum over agents is the only cross-device communication (an
    all-reduce riding ICI), exactly mirroring the reference's OpenMP
    reduction in ``detail::total_cost`` (nash.hpp:39-51).
    """
    specs = shard_specs(specs, mesh, batch_axes=2)

    @jax.jit
    def step(s):
        result = jax.vmap(jax.vmap(solve_fn))(s)
        return result, jnp.sum(result.cost, axis=1)

    return step(specs)


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (DCN across hosts).

    Thin wrapper over ``jax.distributed.initialize`` so multi-host drivers
    have a single framework entry point; on a single host it is a no-op.
    """
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # Already initialized or single-process environment.
        pass
