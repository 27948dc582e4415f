"""Pallas single-pass tap-reduce weight gradient for single-channel convs.

Target: the ci==1 stride-1 wgrad class (CasNet up_ru unit0 [3,3,3,1,1] and
siblings — reference conv set /root/reference/code/GAN/GAN_final.py:92-122).
The XLA route (ops/fastconv._wgrad_im2col_ci1) materializes a [vox, k^3]
patch matrix in HBM before one MXU dot; on the canonical 128^3 step that
build is the round-5 nonconv budget's `concatenate.177` — 20.45 ms at 53%
of practical HBM peak, because k^3=27 lanes pad to 128 (taps-minor) and the
whole 4.2M-voxel volume is rewritten 27 columns wide either way.

This kernel materializes NOTHING: per (batch, depth-tile) grid step it DMAs
one input slab HBM->VMEM, then for each of the k^3 kernel taps multiplies
the statically-shifted slab window against the cotangent tile and
accumulates an f32 [k^3, C] output block that lives in VMEM across the
whole grid. HBM traffic = one read of each operand (~(k-1)/T slab overlap)
vs the im2col route's >= 3 full-volume passes.

Constraints (fall back to the XLA route otherwise): strides (1,1,1), SAME
geometry (out spatial == in spatial before padding), single-channel `a`
operand. The dy/co operand may carry C channels (C small: <= 32).

STATUS — RETIRED, measured round 6: the kernel passes CPU interpret-mode
parity (tests/test_tap_reduce_kernel.py) but Mosaic REJECTS it on real
TPU hardware: "Not implemented: Unsupported reshape" on
vector<8x128x128xf32> -> vector<8x128x128x1xf32> (the trailing unit-dim
expand in the accumulator update; tpu_tests/chip_queue_logs/
taps_major.log). The taps-major im2col variant it was racing measured
NEUTRAL (232.23 vs 232.16 strict slices/s), and the concatenate it
targets is 20.2 ms/step at 45% practical peak — residual value ~0.5% of
step time. Kept as an experiment record; `fastconv.set_ci1_pallas` is an
experiment hook only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(T, k, a_ref, b_ref, out_ref, a_scratch, sem):
    n = pl.program_id(0)
    dt = pl.program_id(1)
    d0 = pl.multiple_of(dt * T, T)
    dma = pltpu.make_async_copy(
        a_ref.at[n, pl.ds(d0, T + k - 1)], a_scratch, sem)
    dma.start()

    @pl.when((n == 0) & (dt == 0))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    b = b_ref[0].astype(jnp.float32)                 # (T, Ho, Wo, C)
    ho, wo, c = b.shape[1], b.shape[2], b.shape[3]
    dma.wait()
    slab = a_scratch[:]                              # (T+k-1, Hp, Wp)
    t = 0
    for td in range(k):
        for th in range(k):
            for tw in range(k):
                win = slab[td:td + T, th:th + ho, tw:tw + wo]
                part = jnp.sum(
                    win.astype(jnp.float32)[..., None] * b, axis=(0, 1, 2))
                out_ref[t, :c] += part               # f32 accumulate
                t += 1


def tap_reduce_wgrad_pallas(a_pad: jax.Array, b: jax.Array, k: int,
                            tile_d: int = 8,
                            interpret: bool = False) -> jax.Array:
    """dw[t, c] = sum over voxels of a_pad shifted by tap t times b[..., c].

    a_pad: (N, Dp, Hp, Wp) the SAME-padded single-channel operand
           (Dp = Do + k - 1 etc.);
    b:     (N, Do, Ho, Wo, C) the other operand (stride-1 cotangent);
    returns (k^3, C) f32 — caller reshapes to (k, k, k, 1, C) [wgrad] or
    transposes per its convention.
    """
    n, dp, hp, wp = a_pad.shape
    _, do, ho, wo, c = b.shape
    assert dp == do + k - 1 and hp == ho + k - 1 and wp == wo + k - 1, (
        "tap_reduce_wgrad_pallas requires SAME stride-1 geometry")
    while do % tile_d:
        tile_d //= 2
    # keep the pipelined b block + a slab comfortably inside ~16 MB VMEM
    while tile_d > 1 and tile_d * ho * wo * c * b.dtype.itemsize > 4 << 20:
        tile_d //= 2
    while do % tile_d:
        tile_d //= 2
    assert tile_d >= 1
    n_d_tiles = do // tile_d

    grid = (n, n_d_tiles)
    kern = functools.partial(_kernel, tile_d, k)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, tile_d, ho, wo, c),
                         lambda nn, tt: (nn, tt, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((k * k * k, 128), lambda nn, tt: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k * k * k, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_d + k - 1, hp, wp), a_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(a_pad, b)
    return out[:, :c]
