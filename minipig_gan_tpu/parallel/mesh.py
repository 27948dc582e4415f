"""Device mesh construction + sharding rules (the framework's one first-class
parallelism component — SURVEY.md §5: replaces the reference's Lightning
`accelerator='dp'` scatter/gather, /root/reference/code/GAN/GAN_final.py:485).

Design: ONE jit-compiled train step, parameters replicated, batch sharded over
the `data` mesh axis. XLA inserts the gradient all-reduce (psum) over ICI
automatically from the shardings — no hand-written collectives needed for DP.
The optional `spatial` axis spatially shards volumes for >HBM workloads
(conv halo exchange handled by XLA's SPMD partitioner).

Batch-norm note: under a single jit program, batch statistics are computed
over the GLOBAL (sharded) batch — i.e. sync-BN — which is the principled
version of what the reference's per-GPU `dp` stats approximate. Per-replica
stats are available via shard_map + `bn_axis_name` if bit-level dp emulation
is ever needed.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a (data, spatial) mesh. data=-1 consumes all remaining devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    spatial = max(1, cfg.spatial)
    data = cfg.data if cfg.data > 0 else n // spatial
    if data * spatial > n:
        raise ValueError(
            f"mesh {data}x{spatial} needs {data*spatial} devices, have {n}"
        )
    devs = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(devs, (DATA_AXIS, SPATIAL_AXIS))


def batch_spec(shard_spatial: bool = False) -> P:
    """Volumes are (N, D, H, W, C): N over data, optionally D over spatial."""
    if shard_spatial:
        return P(DATA_AXIS, SPATIAL_AXIS)
    return P(DATA_AXIS)


def batch_sharding(mesh: Mesh, shard_spatial: bool = False) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(shard_spatial))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, shard_spatial: bool = False) -> Any:
    """Device-put a host batch with the batch dim split across `data`."""
    sh = batch_sharding(mesh, shard_spatial)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
