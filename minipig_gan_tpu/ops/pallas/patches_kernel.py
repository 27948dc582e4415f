"""Pallas patch-extraction kernel: random 16^3 ROI crops as aligned DMAs.

The patch+perceptual training mode crops 128 random 16^3 patches per volume
inside every train step (reference does it on HOST via MONAI
RandSpatialCropSamplesd, /root/reference/test_runs/GAN.py:263-272,311-337; our
XLA path in ops/patches.py is a vmap'd dynamic_slice that lowers to a large
gather). This kernel instead streams one tiling-aligned slab per patch from
the volume in HBM into VMEM and finishes the crop on-chip.

Mosaic tiling makes the naive "DMA exactly the 16^3 box" illegal: the last
two dims of an HBM array are (sublane, lane)-tiled — (8, 128) for f32,
(16, 128) for bf16 — so DMA slices must be sublane-aligned in H and cover
full lane groups in W. Arbitrary offsets are only free on the UNTILED major
dims (B, D). The kernel therefore:

  1. DMAs vol[b, z0:z0+rz, y_al:y_al+slab_h, :] -> VMEM, where y_al is y0
     rounded down to the sublane tile (slab_h = ry + tile covers any
     misalignment) and the full W lane extent rides along;
  2. slices the Y window with a dynamic SUBLANE offset (legal in VMEM);
  3. extracts the X window on the MXU: one-hot selection matrix
     sel[w, j] = (w == x0 + j), out = rows @ sel — no lane-misaligned
     access anywhere.

Corner indices arrive through `PrefetchScalarGridSpec` scalar prefetch, so
the DMA source addresses are known before each grid step runs, and the
pipeline double-buffers the next patch's DMA behind the current matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane_tile(dtype) -> int:
    return 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8


def _patch_kernel(roi, slab_h, w_in, corners_ref, vol_ref, out_ref, slab, sem):
    # corners_ref rows: (b, z0, y_al, dy, x0_scaled); vol_ref (B, D, H, W*C).
    i = pl.program_id(0)
    b = corners_ref[i, 0]
    z0 = corners_ref[i, 1]
    # the wrapper aligned y_al to the sublane tile; Mosaic can't prove that
    # through the clip/mul, so assert it (HBM tiling granularity is 8 rows
    # for both f32 and packed bf16)
    y_al = pl.multiple_of(corners_ref[i, 2], 8)
    dy = corners_ref[i, 3]
    x0 = corners_ref[i, 4]
    dma = pltpu.make_async_copy(
        vol_ref.at[b, pl.ds(z0, roi[0]), pl.ds(y_al, slab_h), :],
        slab,
        sem,
    )
    dma.start()
    dma.wait()
    # Y window: dy is dynamic but bounded by the sublane tile; Mosaic can't
    # prove alignment for a dynamic sublane offset, so branch over the few
    # possible STATIC offsets (constant sublane shifts compile fine).
    n_dy = slab.shape[1] - roi[1] + 1
    rows = jax.lax.switch(
        dy, [functools.partial(lambda k: slab[:, k:k + roi[1], :], k)
             for k in range(n_dy)],
    )  # (rz, ry, W*C)
    # lane extraction as an MXU one-hot contraction: sel[w, j] = (w == x0 + j).
    # HIGHEST precision so the pass-through is exact (default MXU precision
    # rounds f32 operands to bf16 — measured 2e-3 error on the real chip).
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (w_in, roi[2]), 0)
    out_ids = jax.lax.broadcasted_iota(jnp.int32, (w_in, roi[2]), 1)
    sel = (lane_ids == x0 + out_ids).astype(jnp.float32)
    picked = jax.lax.dot_general(
        rows.reshape(roi[0] * roi[1], w_in).astype(jnp.float32), sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = picked.reshape(*roi).astype(out_ref.dtype)


def extract_patches_pallas(
    vols: jax.Array,
    corners: jax.Array,
    roi: Tuple[int, int, int],
    interpret: bool = False,
) -> jax.Array:
    """vols (B, D, H, W, C), corners (B, S, 3) -> (B*S, *roi, C).

    Same contract as ops.patches.extract_patches (sample-major within item,
    item-major overall), implemented as one aligned slab DMA + on-chip crop
    per patch.
    """
    b, d, h, w, c = vols.shape
    s = corners.shape[1]
    n = b * s
    tile = _sublane_tile(vols.dtype)
    slab_h = min(h, roi[1] + tile)

    flat = corners.reshape(n, 3).astype(jnp.int32)
    z0 = flat[:, 0]
    y0 = flat[:, 1]
    x0 = flat[:, 2]
    y_al = jnp.clip((y0 // tile) * tile, 0, h - slab_h)
    dy = y0 - y_al
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s)
    # fold channels into W so the minor dims stay (H, W*C)-tiled; the X
    # selection window scales by C (contiguous lanes, C is almost always 1)
    packed = jnp.stack([batch_idx, z0, y_al, dy, x0 * c], axis=1)  # (N, 5)
    vols4 = vols.reshape(b, d, h, w * c)

    roi_scaled = (roi[0], roi[1], roi[2] * c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, *roi_scaled),
            lambda i, corners_ref: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((roi[0], slab_h, w * c), vols.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_patch_kernel, roi_scaled, slab_h, w * c),
        out_shape=jax.ShapeDtypeStruct((n, *roi_scaled), vols.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * roi[0] * roi[1] * (w * c) * roi_scaled[2],
            bytes_accessed=n * roi[0] * slab_h * w * c * vols.dtype.itemsize
            + n * roi[0] * roi[1] * roi_scaled[2] * vols.dtype.itemsize,
            transcendentals=0,
        ),
    )(packed, vols4)
    return out.reshape(n, *roi, c)
