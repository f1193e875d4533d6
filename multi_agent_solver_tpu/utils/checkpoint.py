"""Checkpoint / resume for solver results and MPC warm starts.

The reference has no on-disk persistence (SURVEY §5: warm starting lives only
in memory via ``update_initial_with_best``).  Long-running batched MPC fleets
and Nash iterations on TPU pods need restartable state, so this module
persists result/warm-start pytrees as compressed ``.npz`` archives with a
stable flattened-key naming scheme -- dependency-free and portable.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

_META_KEY = "__pytree_meta__"


def save_pytree(path, tree: Any) -> None:
    """Save an arbitrary array pytree (dicts/lists/tuples/NamedTuple/flax
    structs of arrays) to ``path`` as an ``.npz``."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps({"n_leaves": len(leaves), "treedef": str(treedef)}).encode(),
        dtype=np.uint8,
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_pytree(path, like: Any = None):
    """Load a pytree saved by :func:`save_pytree`.

    Pass ``like`` (a pytree with the same structure) to restore the original
    container structure and device placement; otherwise a list of arrays is
    returned in flattening order.
    """
    with np.load(Path(path), allow_pickle=False) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    if like is None:
        return leaves
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, 'like' expects {treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_warm_start(path, states, controls) -> None:
    """Persist a (states, controls) warm start pair."""
    save_pytree(path, {"states": states, "controls": controls})


def load_warm_start(path) -> Dict[str, jnp.ndarray]:
    # Dict pytrees flatten in sorted-key order: "controls" precedes "states".
    leaves = load_pytree(path)
    return {"controls": leaves[0], "states": leaves[1]}
