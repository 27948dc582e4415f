"""Pallas patch-extraction kernel: random 16^3 ROI gather as per-patch DMAs.

The patch+perceptual training mode crops 128 random 16^3 patches per volume
inside every train step (reference does it on HOST via MONAI
RandSpatialCropSamplesd, /root/reference/test_runs/GAN.py:263-272,311-337; our
XLA path in ops/patches.py is a vmap'd dynamic_slice that lowers to a large
gather). This kernel instead streams each patch with one async DMA from the
volume in HBM directly into the output block in VMEM — no gather unit, no
index tensors, overlapping the next patch's DMA with the previous store via
the pipeline's double buffering.

Corner indices arrive through `PrefetchScalarGridSpec` scalar prefetch, so
the DMA source addresses are known before each grid step runs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(roi, corners_ref, vol_ref, out_ref, sem):
    # vol_ref is (B, D, H, W) — channel squeezed so (H, W) carry the
    # (sublane, lane) tiling; the DMA slices all four major dims.
    i = pl.program_id(0)
    b = corners_ref[i, 0]
    z = corners_ref[i, 1]
    y = corners_ref[i, 2]
    x = corners_ref[i, 3]
    dma = pltpu.make_async_copy(
        vol_ref.at[b, pl.ds(z, roi[0]), pl.ds(y, roi[1]), pl.ds(x, roi[2])],
        out_ref.at[0],
        sem,
    )
    dma.start()
    dma.wait()


def extract_patches_pallas(
    vols: jax.Array,
    corners: jax.Array,
    roi: Tuple[int, int, int],
    interpret: bool = False,
) -> jax.Array:
    """vols (B, D, H, W, C), corners (B, S, 3) -> (B*S, *roi, C).

    Same contract as ops.patches.extract_patches (sample-major within item,
    item-major overall), implemented as one DMA per patch.
    """
    b, d, h, w, c = vols.shape
    s = corners.shape[1]
    n = b * s
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s)[:, None]
    flat = jnp.concatenate(
        [batch_idx, corners.reshape(n, 3).astype(jnp.int32)], axis=1
    )  # (N, 4): b, z, y, x

    # fold channels into W so the minor dims stay (H, W*C)-tiled; C is almost
    # always 1 here (single-modality volumes)
    vols4 = vols.reshape(b, d, h, w * c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, roi[0], roi[1], roi[2] * c),
            lambda i, corners_ref: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    roi_scaled = (roi[0], roi[1], roi[2] * c)
    corners_scaled = flat.at[:, 3].multiply(c) if c != 1 else flat
    out = pl.pallas_call(
        functools.partial(_patch_kernel, roi_scaled),
        out_shape=jax.ShapeDtypeStruct((n, *roi_scaled), vols.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(corners_scaled, vols4)
    return out.reshape(n, *roi, c)
