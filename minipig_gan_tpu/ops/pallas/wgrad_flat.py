"""Pallas conv3d weight-gradient for single-input-channel convs.

The canonical step's worst wgrad class is Ci == 1: every CasNet UNet block's
first convolutions ([3,3,3,1,16] unit0 + residual, 12-24 executions/step)
and the discriminator's block0 [3,3,3,1,64] (reference op being replaced:
the cuDNN wgrads behind Conv3d(1, 16/64, k3, s1) in
/root/reference/code/GAN/GAN_final.py:100-114,165-171). XLA's swapped-conv
formulation occupies 1 of 128 lanes for these (~3.2 ms/exec in-step at ~5%
of the HBM roofline) AND forces a batch-in-sublanes relayout copy of the
whole input volume per execution (the [2,128^3,1] copies at 10 GB/s in
tpu_tests/nonconv_budget.py).

Design — hybrid "flat-plane shift-dot", XLA im2col + Pallas streaming dot:

  dw[kd,kh,kw,0,co] = sum_{n,z,y,x} xpad[n, z+kd, y+kh, x+kw] * dy[n,z,y,x,co]

  * Host (XLA) side: x is spatially padded (the conv's own padding), each
    z-plane flattened to one row; dy's x-dim is RIGHT-PADDED with zeros to
    x's row width and flattened to [Vc, co]. With equal row widths the 2-D
    window shift (kh, kw) becomes a 1-D shift off = kh*row_w + kw of the
    flat plane, so the k^3-row tap matrix P[n, z, t, :] =
    xflat[n, z+kd, off_t : off_t+Vc] is built by k^3 plain strided slices —
    XLA emits these at near-roofline (Ci == 1 keeps the matrix k^3 x the
    single-channel volume, cheap). dy's zero pad columns/tail annihilate
    every out-of-window term, so no masking anywhere.
  * Pallas side: grid (n, z); per step ONE MXU dot [32, Vc] x [Vc, co]
    f32-accumulated into the resident [32, co] output block (constant
    output index map, zeroed at the first step). The all-voxel contraction
    streams through the MXU K dim — this is the part XLA's own dot emitter
    handles badly for vox-major layouts (its [vox,27]x[vox,co] dot measures
    9.6/39 ms standalone for co=16/64 where this kernel runs the same
    contraction at plane-DMA speed).

  An earlier all-Pallas variant built P inside the kernel from lane-shifted
  slices of the flat plane; Mosaic lowers those 27 single-sublane unaligned
  row writes at ~8x vector-op cost and it measured 5.9-13.7 ms standalone —
  the relayout belongs to XLA's strided-copy machinery, not the VPU.

Supported: Ci == 1, strides (1,1,1), any (small) kernel size, any padding,
any Co. Grad-exactness vs jax.grad is tested in tests/test_pallas_kernels.py
::test_wgrad_ci1_flat_matches_autodiff (interpret mode); chip measurements
in tpu_tests/wgrad_flat_bench.py (BENCH_NOTES.md round-5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Int3 = Tuple[int, int, int]

_ROWS = 32  # tap-matrix sublane allocation (>= k^3, MXU-tile aligned)


def conv3d_wgrad_ci1_supported(x_shape, kernel_size: Int3,
                               strides: Int3) -> bool:
    kd, kh, kw = kernel_size
    return (x_shape[-1] == 1 and strides == (1, 1, 1)
            and kd * kh * kw <= _ROWS)


def _kernel(p_ref, dy_ref, out_ref):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        p_ref[0, 0], dy_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def conv3d_wgrad_ci1_flat(x, dy, kernel_size: Int3, strides: Int3,
                          pads, interpret: bool = False):
    """dw [kd,kh,kw,1,co] for y = conv(x, w) with Ci == 1, stride 1.

    x: [N, D, H, W, 1]; dy: [N, Zo, Ho, Wo, co]; pads: ((lo,hi),)*3.
    """
    assert conv3d_wgrad_ci1_supported(x.shape, kernel_size, strides)
    n, d, h, w, _ = x.shape
    zo, ho, wo, co = dy.shape[1:]
    kd, kh, kw = kernel_size
    (pd0, pd1), (ph0, ph1), (pw0, pw1) = pads
    row_w = w + pw0 + pw1
    hp = h + ph0 + ph1
    zx = d + pd0 + pd1
    assert zo == zx - kd + 1 and ho == hp - kh + 1 and wo == row_w - kw + 1

    v0 = ho * row_w
    vc = _round_up(v0, 128)
    max_off = (kh - 1) * row_w + (kw - 1)
    lp = max(hp * row_w, max_off + vc)

    xp = jnp.pad(x[..., 0], ((0, 0), (pd0, pd1), (ph0, ph1), (pw0, pw1)))
    xf = xp.reshape(n, zx, hp * row_w)
    if lp > hp * row_w:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, lp - hp * row_w)))
    # XLA-side im2col: k^3 flat strided slices -> [n, zo, ROWS, vc]
    taps = [
        jax.lax.slice(xf, (0, td, off), (n, td + zo, off + vc))
        for td in range(kd)
        for off in (th * row_w + tw for th in range(kh) for tw in range(kw))
    ]
    taps += [jnp.zeros_like(taps[0])] * (_ROWS - len(taps))
    p = jnp.stack(taps, axis=2)

    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, 0), (0, row_w - wo), (0, 0)))
    dyf = dyp.reshape(n, zo, v0, co)
    if vc > v0:
        dyf = jnp.pad(dyf, ((0, 0), (0, 0), (0, vc - v0), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(n, zo),
        in_specs=[
            pl.BlockSpec((1, 1, _ROWS, vc), lambda n_, z_: (n_, z_, 0, 0)),
            pl.BlockSpec((1, 1, vc, co), lambda n_, z_: (n_, z_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, co), lambda n_, z_: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((_ROWS, co), jnp.float32),
        # the [vc, co] dy block tiles at up-to-8x lane waste for co < 128;
        # the default 16 MB scoped-vmem budget is too tight for 128^3 planes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(p, dyf)
    return out[:kd * kh * kw].reshape(kd, kh, kw, 1, co).astype(dy.dtype)
