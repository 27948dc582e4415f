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
    """Device-put a host batch with the batch dim split across `data`.

    Single-process: a plain sharded device_put. Multi-host (after
    `maybe_initialize_distributed`): each process contributes its LOCAL
    batch slice and the result is the global array spanning all hosts —
    `jax.make_array_from_process_local_data` concatenates the per-process
    slices along the sharded batch dim, so the global batch size is
    local_batch * process_count."""
    sh = batch_sharding(mesh, shard_spatial)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def maybe_initialize_distributed() -> bool:
    """Multi-host (pod-slice / DCN) bring-up — the `sync_dist=True`
    future-proofing the reference gestures at (GAN_final.py:266-295) made
    real. Call BEFORE any jax backend use (the train CLI does). No-op
    unless the environment requests it:

      * `MINIPIG_DISTRIBUTED=1` — TPU pod auto-detection
        (`jax.distributed.initialize()` with no args reads the TPU
        topology metadata), or
      * `JAX_COORDINATOR_ADDRESS` (+ `JAX_NUM_PROCESSES`,
        `JAX_PROCESS_ID`) — explicit bring-up for CPU/GPU fleets.

    After initialization `jax.devices()` spans every host's chips, so
    `make_mesh()` builds the GLOBAL data-parallel mesh and the same jit
    train step runs SPMD across hosts: XLA routes the gradient psum over
    ICI within a slice and DCN between slices. Feed batches through
    `shard_batch` (per-process local slices) and gate host-side writes on
    `jax.process_index() == 0` (train/loop.py does both).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (addr or os.environ.get("MINIPIG_DISTRIBUTED") == "1"):
        return False
    # CPU fleets need a cross-process collectives backend; gloo is the one
    # jax ships. Auto-select it when the platform is forced to cpu
    # (MINIPIG_CPU_COLLECTIVES=none opts out; TPU pods ignore this — their
    # collectives ride ICI/DCN natively).
    coll = os.environ.get("MINIPIG_CPU_COLLECTIVES", "gloo")
    if coll != "none" and (
            os.environ.get("MINIPIG_PLATFORM") == "cpu"
            or os.environ.get("JAX_PLATFORMS", "") == "cpu"):
        jax.config.update("jax_cpu_collectives_implementation", coll)
    kwargs = {}
    if addr:
        missing = [k for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                   if k not in os.environ]
        if missing:
            raise RuntimeError(
                f"JAX_COORDINATOR_ADDRESS is set but {missing} are not — "
                "explicit multi-host bring-up needs all three (or use "
                "MINIPIG_DISTRIBUTED=1 on a TPU pod for auto-detection)")
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    return True
