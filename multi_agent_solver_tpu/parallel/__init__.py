"""Batching, device-mesh scale-out, and multi-start solving."""

from .batching import batch_solve, batch_spec_over, replicate_spec
from .mesh import (
    make_mesh,
    mesh_batch_solve,
    mesh_batch_solve_fast,
    mesh_multi_agent_solve,
    shard_specs,
)
from .multistart import multistart_solve, random_control_starts

__all__ = [
    "batch_solve",
    "batch_spec_over",
    "replicate_spec",
    "make_mesh",
    "mesh_batch_solve",
    "mesh_batch_solve_fast",
    "mesh_multi_agent_solve",
    "shard_specs",
    "multistart_solve",
    "random_control_starts",
]
