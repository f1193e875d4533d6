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


def mesh_coupled_nash_solve(
    batched_solve_fn: Callable[[OCPSpec], SolveResult],
    specs: OCPSpec,
    inter_agent_cost: Callable,
    mesh: Mesh,
    max_outer: int = 8,
    k_neighbors: Optional[int] = None,
    distance_dims: Sequence[int] = (0, 1),
):
    """Coupled Nash (Jacobi) sweeps with agents sharded over the mesh.

    Each device owns ``N / mesh.shape['agent']`` agents and, per sweep,
    ``all_gather``\\ s every agent's frozen plan across the ``agent`` axis --
    the one place the multi-agent problem genuinely needs a collective (an
    ICI all-gather of [N, T+1, nx] states; everything else stays local).
    The sweep semantics mirror ``SequentialNashStrategy._run_stacked``
    exactly (unconditional Jacobi best-response against frozen plans,
    nash.hpp:53-90 + the coupling extension), so results match the
    single-device stacked path to float tolerance.

    ``specs``: the stacked [N, ...] agent specs with the UNCOUPLED stage
    cost (as from ``strategies.base.stack_agent_specs``); the coupled
    context cost is attached here via the same memoized builder the Nash
    strategies use, so compilations are shared.

    ``k_neighbors``: as ``MultiAgentProblem.coupling_neighbors`` -- couple
    each agent only to its K nearest (in ``distance_dims`` of the state)
    instead of all N-1 others.

    Returns ``(states [N,T+1,nx], controls [N,T,nu], costs [N], total)``
    with per-agent costs evaluated against the FINAL joint plans and
    ``total`` their psum over the mesh.
    """
    try:
        from jax import shard_map  # jax >= 0.5 canonical location
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from ..ocp import with_context_cost
    from ..strategies.nash import make_coupled_stage

    N = int(specs.initial_state.shape[0])
    n_shards = mesh.shape[AGENT_AXIS]
    if N % n_shards != 0:
        raise ValueError(f"agents {N} must divide agent axis {n_shards}")
    n_local = N // n_shards
    T = specs.horizon_steps

    cspecs = with_context_cost(
        specs, make_coupled_stage(specs.stage_cost, inter_agent_cost)
    )

    if k_neighbors is not None and int(k_neighbors) >= N - 1:
        k_neighbors = None  # all-pairs is cheaper than a KNN of everyone

    if k_neighbors is None:
        others_idx = jnp.asarray(
            np.stack([[j for j in range(N) if j != i] for i in range(N)])
        )  # [N, N-1]
    else:
        dims = jnp.asarray(np.asarray(distance_dims))

    def local_ctx(states_local, gid0):
        """Coupling context for this shard's agents from gathered plans."""
        states_all = jax.lax.all_gather(
            states_local, AGENT_AXIS, tiled=True
        )  # [N, T+1, nx]
        if k_neighbors is None:
            rows = jax.lax.dynamic_slice_in_dim(others_idx, gid0, n_local, 0)
            ctx = states_all[rows]                        # [n_local, N-1, T+1, nx]
            return jnp.swapaxes(ctx[:, :, :-1, :], 1, 2)  # [n_local, T, N-1, nx]
        K = int(k_neighbors)
        st_all = states_all[:, :T, :]                     # [N, T, nx]
        pos_all = st_all[:, :, dims]                      # [N, T, d]
        pos_loc = states_local[:, :T, dims]               # [n_local, T, d]
        diff = pos_loc[:, None] - pos_all[None]           # [n_local, N, T, d]
        d2 = jnp.sum(diff**2, axis=-1)                    # [n_local, N, T]
        self_mask = (gid0 + jnp.arange(n_local))[:, None] == jnp.arange(N)[None, :]
        d2 = d2 + 1e30 * self_mask[:, :, None]
        _, idx = jax.lax.top_k(-jnp.moveaxis(d2, 2, 1), K)  # [n_local, T, K]
        ts = jnp.arange(T)[None, :, None]
        return st_all[idx, ts]                              # [n_local, T, K, nx]

    def shard_fn(local_specs):
        gid0 = jax.lax.axis_index(AGENT_AXIS) * n_local
        xs0 = jax.vmap(lambda s: s.rollout(s.initial_controls))(local_specs)

        def sweep(_, carry):
            warm, states = carry
            s = local_specs.replace(
                initial_controls=warm, context=local_ctx(states, gid0)
            )
            res = batched_solve_fn(s)
            return res.controls, res.states

        controls, states = jax.lax.fori_loop(
            0, max_outer, sweep, (local_specs.initial_controls, xs0)
        )

        ctx = local_ctx(states, gid0)
        costs = jax.vmap(lambda s, x, u, c: s.replace(context=c).cost(x, u))(
            local_specs, states, controls, ctx
        )
        total = jax.lax.psum(jnp.sum(costs), AGENT_AXIS)
        return states, controls, costs, total

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P(AGENT_AXIS)))

    cspecs = jax.tree_util.tree_map(place, cspecs)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AGENT_AXIS),),
        out_specs=(P(AGENT_AXIS), P(AGENT_AXIS), P(AGENT_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)(cspecs)


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (DCN across hosts).

    Thin wrapper over ``jax.distributed.initialize`` so multi-host drivers
    (scripts/bench_mesh.py, docs/MULTIHOST.md) have a single framework
    entry point.  Explicitly requested initialization (any non-None kwarg,
    e.g. ``coordinator_address``) propagates failures -- a pod launch that
    cannot form its coordination service must die loudly, not limp on as
    N disconnected single-host runs.  With no kwargs it attempts
    auto-detection (TPU metadata / cluster env vars) and stays a silent
    no-op on plain single-host environments.
    """
    # Idempotence guard.  NOT jax.process_count(): that would itself
    # initialize the XLA backend, after which jax.distributed.initialize
    # refuses to run ("must be called before any JAX calls") -- the guard
    # would break the very launch it guards (found by
    # scripts/multiprocess_smoke.py).
    if jax.distributed.is_initialized():
        return  # already initialized
    explicit = any(v is not None for v in kwargs.values())
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if explicit:
            raise
        # Auto-detection on a single-host environment: stay local.
