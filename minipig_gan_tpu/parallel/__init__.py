"""Mesh + sharding rules for DP/spatial parallelism over TPU ICI."""

from .mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    batch_spec,
    make_mesh,
    maybe_initialize_distributed,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "make_mesh",
    "maybe_initialize_distributed",
    "batch_sharding",
    "batch_spec",
    "replicate",
    "replicated",
    "shard_batch",
]
