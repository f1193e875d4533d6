"""Batching and device-mesh scale-out (vmap / pjit / shard_map)."""
