"""Pallas fused separable trilinear resample (axis-aligned fast path).

The XLA formulation (ops/resample.py separable_resample) runs three einsum
passes, materializing two full intermediate volumes in HBM — the op is
bandwidth-bound, so that's ~3x the minimal HBM traffic. This kernel fuses all
three interpolation contractions: per output z-tile it DMAs only the needed
input z-slab HBM->VMEM (slab offsets precomputed on host from the weight
sparsity and delivered via scalar prefetch), performs the z/y/x contractions
on the MXU entirely in VMEM, and writes the finished output tile — one read
of the input, one write of the output.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(slab, tz, z0_ref, wz_local_ref, wy_ref, wx_ref, vol_ref, out_ref,
            slab_scratch, sem_vol):
    t = pl.program_id(0)
    z0 = z0_ref[t]
    dma_v = pltpu.make_async_copy(
        vol_ref.at[pl.ds(z0, slab)], slab_scratch, sem_vol)
    dma_v.start()
    # Wz arrives pre-windowed per tile on the host ((n_tiles, TZ, SLAB),
    # blocked by BlockSpec) — Mosaic requires lane-aligned dynamic slices, so
    # no in-kernel Wz slicing.
    wz_local = wz_local_ref[0]                      # (TZ, SLAB)
    dma_v.wait()
    vol_slab = slab_scratch[:]                      # (SLAB, Y, X)
    y_in, x_in = vol_slab.shape[1], vol_slab.shape[2]
    tmp = jax.lax.dot_general(                       # (TZ, Y*X)
        wz_local, vol_slab.reshape(slab, y_in * x_in),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, y_in, x_in)
    tmp = jax.lax.dot_general(                       # (TZ, X, Yo)
        tmp, wy_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    tmp = jax.lax.dot_general(                       # (TZ, Yo, Xo)
        tmp, wx_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # after the two dot_generals the layout is (TZ, Yo, Xo): the second
    # contraction consumed X (axis 1 of (TZ, X, Yo)).
    out_ref[:] = tmp


def separable_resample_pallas(
    vol: jax.Array,
    weights_zyx: Tuple[np.ndarray, np.ndarray, np.ndarray],
    tz: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """vol (Z, Y, X) f32; weights (Wz (Zo, Z), Wy (Yo, Y), Wx (Xo, X)) as
    HOST numpy arrays (slab offsets are derived from Wz's sparsity pattern
    on the host). Returns (Zo, Yo, Xo) f32."""
    wz, wy, wx = (np.asarray(w, np.float32) for w in weights_zyx)
    z_in = vol.shape[0]
    zo = wz.shape[0]
    n_tiles = -(-zo // tz)
    # pad Wz rows to a multiple of tz (zero rows produce zero output rows)
    if n_tiles * tz != zo:
        wz = np.concatenate([wz, np.zeros((n_tiles * tz - zo, z_in), np.float32)])
    # per-tile slab start + global static slab size from the sparsity pattern
    z0s = np.zeros((n_tiles,), np.int32)
    span = 1
    for t in range(n_tiles):
        rows = wz[t * tz : (t + 1) * tz]
        cols = np.nonzero(rows.any(axis=0))[0]
        if len(cols):
            z0s[t] = cols[0]
            span = max(span, int(cols[-1] - cols[0] + 1))
    slab = min(z_in, span)
    z0s = np.clip(z0s, 0, max(z_in - slab, 0))
    # pre-window Wz per tile: (n_tiles, TZ, SLAB)
    wz_local = np.zeros((n_tiles, tz, slab), np.float32)
    for t in range(n_tiles):
        wz_local[t] = wz[t * tz : (t + 1) * tz, z0s[t] : z0s[t] + slab]

    zo_pad = n_tiles * tz
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tz, slab), lambda t, zref: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # per-tile Wz window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wy
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wx
            pl.BlockSpec(memory_space=pltpu.HBM),   # vol stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (tz, wy.shape[0], wx.shape[0]), lambda t, zref: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((slab, vol.shape[1], vol.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, slab, tz),
        out_shape=jax.ShapeDtypeStruct((zo_pad, wy.shape[0], wx.shape[0]),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * zo_pad * z_in * vol.shape[1] * vol.shape[2]
            + 2 * zo_pad * vol.shape[1] * wy.shape[0] * vol.shape[2]
            + 2 * zo_pad * wy.shape[0] * vol.shape[2] * wx.shape[0],
            bytes_accessed=vol.size * 4 + zo_pad * wy.shape[0] * wx.shape[0] * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(z0s),
        jnp.asarray(wz_local),
        jnp.asarray(wy),
        jnp.asarray(wx),
        jnp.asarray(vol, jnp.float32),
    )
    return out[:zo]
