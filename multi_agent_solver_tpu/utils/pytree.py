"""Frozen pytree dataclasses (the framework's only struct machinery).

JAX-native replacement for the ``flax.struct`` dependency: a frozen
``dataclasses.dataclass`` registered with
``jax.tree_util.register_dataclass``.  Fields default to dynamic pytree
leaves (batchable / shardable / traceable); fields declared with
``field(pytree_node=False)`` become static metadata that participates in
the jit compilation key instead (exactly how ``OCPSpec`` separates warm
starts and bounds from dynamics callables and dimensions).

``.replace(**updates)`` returns a new frozen instance -- the idiom every
solver uses to rebind ``initial_state`` / ``initial_controls`` per lane.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Type, TypeVar

import jax

_T = TypeVar("_T")


def field(pytree_node: bool = True, **kwargs: Any) -> Any:
    """Dataclass field marked as a dynamic leaf (default) or static metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["pytree_node"] = pytree_node
    return dataclasses.field(metadata=metadata, **kwargs)


def _replace(self: _T, **updates: Any) -> _T:
    return dataclasses.replace(self, **updates)


def pytree_dataclass(cls: Type[_T]) -> Type[_T]:
    """Decorator: frozen dataclass + pytree registration + ``.replace``."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = [
        f.name for f in dataclasses.fields(cls)
        if f.metadata.get("pytree_node", True)
    ]
    meta_fields = [
        f.name for f in dataclasses.fields(cls)
        if not f.metadata.get("pytree_node", True)
    ]
    cls = jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    cls.replace = _replace
    return cls
