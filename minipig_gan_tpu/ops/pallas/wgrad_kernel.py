"""Pallas conv3d weight-gradient kernel (VMEM im2col + MXU dot).

Why: the conv-level budget of the canonical GAN step (tpu_tests/
conv_budget.py) shows TPU conv WEIGHT gradients are the largest conv
category — 529 ms of a 2321 ms step — running at ~30 TF/s or worse: XLA
compiles wgrad as a `f012b_i012o` convolution whose contraction runs over
batch+spatial with only Ci lanes occupied, re-streaming the activation from
HBM per kernel tap. (Reference hot path being replaced: every
Conv3d/BatchNorm backward in /root/reference/code/GAN/GAN_final.py:92-209,
there executed by cuDNN wgrad kernels.)

Design (one grid program per (tap-plane td, batch n, output-depth od)):
  * x arrives as one padded H×W input PLANE in VMEM (BlockSpec-pipelined),
    dy as the matching output plane.
  * The kernel im2cols the plane in VMEM into [R·Wo, kh·kw·Ci] row-chunks
    (R output rows per chunk, chosen to fit VMEM) and issues ONE MXU
    `dot_general` per chunk, f32-accumulating into the [kh·kw·Ci, Co]
    output block — contraction (R·Wo) in the MXU's K dimension, all taps'
    columns live simultaneously, one HBM read per plane instead of one per
    tap.
  * Strided convs (s=2) sample the plane through a phase-reshape view
    ([Hp] -> [Hp/2, 2], free in VMEM) rather than strided loads.
  * The output block's grid index depends only on td (slowest grid dim), so
    all (n, od) programs accumulate into the same resident VMEM block —
    zeroed at the first program of each td run (standard Pallas revisit
    accumulation).

Supported: NDHWC x, dy; DHWIO dw; symmetric padding; cubic kernels/strides
with s in {1, 2}; Ci and Co >= 8 (smaller channel counts fall back to the
XLA formulation — their lanes-starved planes need a different layout; see
conv3d_wgrad_supported).

Measured on the v5e chip (tpu_tests/wgrad_bench.py): see BENCH_NOTES.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Int3 = Tuple[int, int, int]

# per-chunk im2col scratch budget (bytes); planes + acc live alongside it
_XC_BUDGET = 4 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def conv3d_wgrad_supported(
    x_shape, dy_shape, kernel_size: Int3, strides: Int3, padding: Int3
) -> bool:
    """Shapes this kernel handles (P1: matmul-friendly channel counts)."""
    kd, kh, kw = kernel_size
    ci, co = x_shape[-1], dy_shape[-1]
    if ci < 8 or co < 8:
        return False
    if any(s not in (1, 2) for s in strides):
        return False
    n, d, h, w = x_shape[0], x_shape[1], x_shape[2], x_shape[3]
    do, ho, wo = dy_shape[1], dy_shape[2], dy_shape[3]
    # geometry must be consistent (VALID over the padded input)
    for i_, o_, k_, s_, p_ in (
        (d, do, kd, strides[0], padding[0]),
        (h, ho, kh, strides[1], padding[1]),
        (w, wo, kw, strides[2], padding[2]),
    ):
        if (i_ + 2 * p_ - k_) // s_ + 1 != o_:
            return False
    # plane VMEM cost (bf16) must leave room for xc + acc
    hp = h + 2 * padding[1]
    wp = w + 2 * padding[2]
    plane = hp * wp * ci * 2 + ho * wo * co * 2
    acc = kd * kh * kw * ci * co * 4
    return plane + acc < 10 * 1024 * 1024


def _phase_view(plane, t, stride, n_out):
    """plane[...] rows t, t+s, ..., t+(n_out-1)*s along axis 0, stride-free.

    For s==2 uses a [P/2, 2] reshape + static phase index (VMEM views only);
    requires the axis extent to be even (caller pads).
    """
    if stride == 1:
        return lax.slice_in_dim(plane, t, t + n_out, axis=0)
    half = plane.shape[0] // 2
    v = plane.reshape((half, 2) + plane.shape[1:])
    v = v[:, t % 2]
    return lax.slice_in_dim(v, t // 2, t // 2 + n_out, axis=0)


def _wgrad_kernel(x_ref, dy_ref, out_ref, xc_ref, *, kh, kw, sh, sw,
                  ho, wo, ci, co, r_chunk):
    td_first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)

    @pl.when(td_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xs = x_ref[0, 0]      # (Hp, Wp, Ci)
    dys = dy_ref[0, 0]    # (Ho, Wo, Co)

    n_full, rem = divmod(ho, r_chunk)

    def do_chunk(r0: int, rows: int):
        # build xc[(rows*Wo), kh*kw*Ci] — all taps' columns for this chunk
        for th in range(kh):
            # output rows r0..r0+rows sample input H rows th + sh*r
            hv = _phase_view(xs, th, sh, ho)             # (Ho, Wp, Ci)
            hv = lax.slice_in_dim(hv, r0, r0 + rows, axis=0)
            for tw in range(kw):
                if sw == 1:
                    sub = lax.slice_in_dim(hv, tw, tw + wo, axis=1)
                else:
                    half = hv.shape[1] // 2
                    v = hv.reshape(rows, half, 2, ci)[:, :, tw % 2, :]
                    sub = lax.slice_in_dim(
                        v, tw // 2, tw // 2 + wo, axis=1)
                c0 = (th * kw + tw) * ci
                xc_ref[: rows * wo, c0:c0 + ci] = sub.reshape(rows * wo, ci)
        dyc = lax.slice_in_dim(dys, r0, r0 + rows, axis=0)
        dyc = dyc.reshape(rows * wo, co)
        out_ref[0] += lax.dot_general(
            xc_ref[: rows * wo, :], dyc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for c in range(n_full):
        do_chunk(c * r_chunk, r_chunk)
    if rem:
        do_chunk(n_full * r_chunk, rem)


def conv3d_wgrad_pallas(
    x: jax.Array,
    dy: jax.Array,
    kernel_size: Int3,
    strides: Int3,
    padding: Int3,
    *,
    interpret: bool = False,
) -> jax.Array:
    """dw (f32, DHWIO = [kd,kh,kw,Ci,Co]) for y = conv(x, w) NDHWC.

    dw[t, ci, co] = sum_{n, o} x_pad[n, s*o + t, ci] * dy[n, o, co].
    f32 accumulation (the XLA bf16 wgrad reduces in bf16 — this kernel is
    both faster and more accurate).
    """
    kd, kh, kw = kernel_size
    sd, sh, sw = strides
    pd, ph, pw = padding
    n, d, h, w, ci = x.shape
    _, do, ho, wo, co = dy.shape

    if pd or ph or pw:
        x = jnp.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
    # phase-reshape views need even extents on strided axes
    if sh == 2 and x.shape[2] % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
    if sw == 2 and x.shape[3] % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
    dp, hp, wp = x.shape[1], x.shape[2], x.shape[3]

    bytes_per_row = wo * kh * kw * ci * x.dtype.itemsize
    r_chunk = max(1, min(ho, _XC_BUDGET // bytes_per_row))

    grid = (kd, n, do)
    out = pl.pallas_call(
        functools.partial(
            _wgrad_kernel, kh=kh, kw=kw, sh=sh, sw=sw,
            ho=ho, wo=wo, ci=ci, co=co, r_chunk=r_chunk,
        ),
        grid=grid,
        in_specs=[
            # one padded input plane: D-row = sd*od + td  (block size 1 in
            # N and D makes the element offset directly expressible)
            pl.BlockSpec(
                (1, 1, hp, wp, ci),
                lambda td, nn, od: (nn, sd * od + td, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ho, wo, co),
                lambda td, nn, od: (nn, od, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # all (n, od) programs of one td accumulate into the same block
        out_specs=pl.BlockSpec(
            (1, kh * kw * ci, co),
            lambda td, nn, od: (td, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kd, kh * kw * ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r_chunk * wo, kh * kw * ci), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x, dy)
    return out.reshape(kd, kh, kw, ci, co)


def conv3d_wgrad_xla(
    x: jax.Array, dy: jax.Array, kernel_size: Int3, strides: Int3,
    padding: Int3
) -> jax.Array:
    """Explicit XLA wgrad — the batch<->feature-swapped conv formulation
    jax's transpose rule emits (fallback for shapes the kernel rejects)."""
    kd, kh, kw = kernel_size
    do, ho, wo = dy.shape[1], dy.shape[2], dy.shape[3]
    pads = []
    for i_, o_, k_, s_, p_ in (
        (x.shape[1], do, kd, strides[0], padding[0]),
        (x.shape[2], ho, kh, strides[1], padding[1]),
        (x.shape[3], wo, kw, strides[2], padding[2]),
    ):
        # input extent consumed = (o-1)*s + k; hi pad completes it
        pads.append((p_, (o_ - 1) * s_ + k_ - i_ - p_))
    return lax.conv_general_dilated(
        x, dy,
        window_strides=(1, 1, 1),
        padding=pads,
        rhs_dilation=strides,
        dimension_numbers=("CDHWN", "IDHWO", "DHWNC"),
    )


def conv3d_wgrad_reference(
    x: jax.Array, dy: jax.Array, kernel_size: Int3, strides: Int3,
    padding: Int3
) -> jax.Array:
    """Autodiff-derived wgrad (ground truth for tests; any backend)."""
    kd, kh, kw = kernel_size
    ci, co = x.shape[-1], dy.shape[-1]

    def f(w):
        y = lax.conv_general_dilated(
            x, w, window_strides=strides,
            padding=[(p, p) for p in padding],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.sum(y * dy)

    w0 = jnp.zeros((kd, kh, kw, ci, co), x.dtype)
    return jax.grad(f)(w0)
