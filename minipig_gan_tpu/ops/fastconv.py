"""Conv3d with explicitly-scheduled gradients (custom_vjp).

Motivation (tpu_tests/conv_budget.py + wgrad_bench.py, v5e): in the compiled
GAN step XLA fuses each conv's weight-gradient with the elementwise backward
chain that produces its cotangent (BatchNorm/LeakyReLU backward selects and
reduces). The fused wgrad then runs ~2x slower than the same wgrad on a
materialized operand — e.g. the D block1 [3,3,3,64,128] wgrad measures
27.5 ms standalone (61 TF/s) but 57 ms inside the step. A hand-written
Pallas im2col wgrad kernel was also measured and LOSES standalone (20 TF/s —
Mosaic column-write relayouts dominate; ops/pallas/wgrad_kernel.py kept as
the record of that experiment).

This wrapper reproduces jax's exact conv gradients, but:
  * passes the incoming cotangent through `lax.optimization_barrier` so the
    elementwise chain is materialized ONCE instead of being re-fused into
    (and recomputed inside) both the dgrad and wgrad convolutions;
  * emits the dgrad/wgrad as plain `conv_general_dilated` calls, each free
    to fuse with its own consumers.

Both gradient formulations are validated against jax.grad of the plain conv
in tests/test_fastconv.py. Numerics: identical math, modulo XLA fusion
rounding (the wgrad conv accumulates exactly as XLA's transpose rule does).

Replaces (TPU-native) the cuDNN conv backward used by every torch Conv3d in
the reference (/root/reference/code/GAN/GAN_final.py:92-209).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Int3 = Tuple[int, int, int]

_DIMN = ("NDHWC", "DHWIO", "NDHWC")


def _fwd_conv(x, w, strides: Int3, pads):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        dimension_numbers=_DIMN)


def _dgrad_polyphase(dy, w, stride: int, in_spatial: Int3):
    """dx for a VALID stride-s conv as s^3 DENSE stride-1 convolutions.

    The lhs-dilated dgrad formulation makes the MXU stream s^3 = 8x zeros
    (dy dilated 2x per axis); decomposing by output phase r = p mod s runs
    each phase as a dense conv over the per-phase kernel taps, then
    interleaves:  dx[s*q + r] = sum_m dy[q - m] w[s*m + r]  per axis
    (derivation + standalone A/Bs in tpu_tests/convgrad_experiment.py:
    1.26x on the D block1<-block2 dgrad [2,124^3,128]<-[2,61^3,256],
    0.5x/0.04x on the smaller cases — hence the size-gated routing in
    conv3d_dgrad). Requires pad=0 (the discriminator's VALID convs),
    cubic k/s with k % s == 0 so every phase has k//s taps.
    """
    s = stride
    k = w.shape[0]
    n, od = dy.shape[0], dy.shape[1]
    m_max = k // s
    # per-phase output length: ceil(i/s) entries so the interleave covers
    # every dx position; out[q] = sum_m dy[q-m] w[s*m+r] needs lead pad
    # m_max-1 (small q) and trail pad L-od (q up to L-1)
    ls = [-(-i // s) for i in in_spatial]
    pad = tuple((m_max - 1, l - od) for l in ls)
    outs = {}
    for rd in range(s):
        sd = np.array(list(range(rd, k, s))[::-1])
        for rh in range(s):
            sh = np.array(list(range(rh, k, s))[::-1])
            for rw in range(s):
                sw = np.array(list(range(rw, k, s))[::-1])
                sub = w[sd][:, sh][:, :, sw]
                subt = jnp.asarray(sub).swapaxes(3, 4)
                outs[rd, rh, rw] = lax.conv_general_dilated(
                    dy, subt, window_strides=(1, 1, 1), padding=pad,
                    dimension_numbers=_DIMN)
    st = jnp.stack([jnp.stack([jnp.stack([outs[rd, rh, rw]
                                          for rw in range(s)], axis=3)
                               for rh in range(s)], axis=2)
                    for rd in range(s)], axis=1)
    # [n, sd, qd, sh, qh, sw, qw, ci] -> [n, qd, sd, qh, sh, qw, sw, ci]
    st = st.transpose(0, 2, 1, 4, 3, 6, 5, 7)
    ci = w.shape[3]
    dx = st.reshape(n, s * ls[0], s * ls[1], s * ls[2], ci)
    return dx[:, :in_spatial[0], :in_spatial[1], :in_spatial[2], :]


def conv3d_dgrad(dy, w, strides: Int3, pads, in_spatial: Int3):
    """dx for y = conv(x, w): transposed (lhs-dilated) convolution; the
    large VALID stride-2 case routes through the polyphase decomposition
    (see _dgrad_polyphase).

    Validated bit-exact against jax.grad (tpu_tests/convgrad_experiment.py,
    tests/test_fastconv.py).
    """
    k = w.shape[:3]
    # Polyphase routing for the large VALID stride-2 dgrads (D block1 <-
    # block2, the step's 208 ms dgrad trio at ~55 TF/s on 8x-dilated MXU
    # work) was integrated and A/B'd: 1.26x standalone, but the interleave
    # stack+transpose materializes ~2x the [2,124^3,128] dx as transients
    # and the canonical config compiles OOM (16.8 GB scan budget in
    # 15.75 GB HBM has no slack). Routing removed; _dgrad_polyphase stays
    # as the measured experiment for memory-slack configs.
    lo_hi = []
    for i in range(3):
        o = (in_spatial[i] + pads[i][0] + pads[i][1] - k[i]) // strides[i] + 1
        lo = k[i] - 1 - pads[i][0]
        hi = in_spatial[i] + k[i] - 1 - ((o - 1) * strides[i] + 1) - lo
        lo_hi.append((lo, hi))
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    return lax.conv_general_dilated(
        dy, wt, window_strides=(1, 1, 1), padding=lo_hi,
        lhs_dilation=strides, dimension_numbers=_DIMN)


def _wgrad_conv(x, dy, kernel_size: Int3, strides: Int3, pads):
    """The batch<->feature-swapped conv formulation jax's transpose rule
    emits. Fine for matmul-heavy channel counts; pathological for tiny ones
    (the [3,3,3,1,1] wgrad measures ~0.03 TF/s on the v5e — 1/128 lanes)."""
    lo_hi = []
    for i in range(3):
        o = dy.shape[1 + i]
        lo = pads[i][0]
        hi = (o - 1) * strides[i] + kernel_size[i] - x.shape[1 + i] - lo
        lo_hi.append((lo, hi))
    return lax.conv_general_dilated(
        x, dy, window_strides=(1, 1, 1), padding=lo_hi,
        rhs_dilation=strides,
        dimension_numbers=("CDHWN", "IDHWO", "DHWNC"))


def _taps(kernel_size: Int3):
    kd, kh, kw = kernel_size
    return [(td, th, tw) for td in range(kd)
            for th in range(kh) for tw in range(kw)]


def _wgrad_im2col_ci1(xp, dy, kernel_size: Int3, strides: Int3):
    """dw[t, 0, co] via a [vox, k^3] patch matrix x one MXU dot.

    Requires Ci == 1 (xp already padded): the patch matrix has only k^3
    columns, so materializing it costs k^3 x the (single-channel) volume —
    cheap — while the contraction runs over all voxels in the MXU K dim.
    """
    n = xp.shape[0]
    o = dy.shape[1:4]
    co = dy.shape[-1]
    k = kernel_size
    if (_CI1_PALLAS and strides == (1, 1, 1) and k[0] == k[1] == k[2]
            and all(xp.shape[1 + i] == o[i] + k[i] - 1 for i in range(3))
            and jax.default_backend() == "tpu"):
        # single-pass Pallas tap-reduce: no patch matrix at all (see
        # ops/pallas/tap_reduce_kernel.py). Chip A/B hook: BENCH_CI1_PALLAS=1.
        from .pallas.tap_reduce_kernel import tap_reduce_wgrad_pallas

        dw = tap_reduce_wgrad_pallas(xp[..., 0], dy, k[0])
        return dw.reshape(*k, 1, co).astype(dy.dtype)
    cols = []
    for td, th, tw in _taps(kernel_size):
        v = lax.slice(
            xp, (0, td, th, tw, 0),
            (n, td + (o[0] - 1) * strides[0] + 1,
             th + (o[1] - 1) * strides[1] + 1,
             tw + (o[2] - 1) * strides[2] + 1, 1),
            (1, strides[0], strides[1], strides[2], 1))
        cols.append(v.reshape(-1))
    dyf = dy.reshape(-1, co)                          # [vox, co]
    if _CI1_TAPS_MAJOR:
        # Taps-major layout: [k^3, vox] puts vox in the 128-lane minor dim
        # (k^3=27 in lanes pads 27 -> 128, ~4.7x physical bytes on every
        # write — the round-5 nonconv budget's concatenate.177, 20.45 ms at
        # 53% practical peak). The dot contracts the LHS minor dim, the
        # MXU-natural K placement. Chip A/B hook: BENCH_CI1_TAPS_MAJOR=1.
        xc = jnp.stack(cols, axis=0)                  # [k^3, vox]
        dw = lax.dot_general(
            xc, dyf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [k^3, co]
    else:
        xc = jnp.stack(cols, axis=-1)                 # [vox, k^3]
        dw = lax.dot_general(
            xc, dyf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [k^3, co]
    return dw.reshape(*kernel_size, 1, co).astype(dy.dtype)


def _wgrad_tap_einsum(xp, dy, kernel_size: Int3, strides: Int3):
    """dw via one [ci, co] contraction per kernel tap — k^3 streaming
    multiply-reduce passes, no giant patch matrix. Wins when ci*co is small
    (the conv formulation's lanes are starved anyway)."""
    n = xp.shape[0]
    o = dy.shape[1:4]
    ci = xp.shape[-1]
    parts = []
    for td, th, tw in _taps(kernel_size):
        v = lax.slice(
            xp, (0, td, th, tw, 0),
            (n, td + (o[0] - 1) * strides[0] + 1,
             th + (o[1] - 1) * strides[1] + 1,
             tw + (o[2] - 1) * strides[2] + 1, ci),
            (1, strides[0], strides[1], strides[2], 1))
        parts.append(lax.dot_general(
            v.reshape(-1, ci), dy.reshape(-1, dy.shape[-1]),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))      # [ci, co]
    dw = jnp.stack(parts, axis=0)
    return dw.reshape(*kernel_size, ci, dy.shape[-1]).astype(dy.dtype)


def conv3d_wgrad(x, dy, kernel_size: Int3, strides: Int3, pads):
    """dw for y = conv(x, w), formulation routed by channel counts.

    Routing is driven by on-chip measurement (tpu_tests/wgrad_formulations.py,
    v5e): ONLY the 1->1-channel conv (CasNet up_ru unit0, the step's single
    worst wgrad at 8.2 ms/exec) beats the conv formulation reliably — its
    [vox, k^3] patch matrix is cheap and the conv formulation occupies 1/128
    lanes. Everything else measured neutral-to-worse once XLA's in-step
    fusion is accounted for (e.g. [16,16] tap-einsum: 1.4x standalone but
    the in-step fused conv is already 2.2x faster than standalone; [16,1]
    role-swap 0.65x; strided tap-einsum 0.26x), so those keep the swapped-
    conv formulation. _wgrad_im2col_ci1 / _wgrad_tap_einsum are kept (and
    tested) as measured alternatives for future shapes.
    """
    ci, co = x.shape[-1], dy.shape[-1]
    if (ci == 1 and (co == 1 or (_CI1_DOT_ALL and co <= 32))
            and all(p[0] == p[1] for p in pads)):
        # Whole Ci==1 class -> im2col dot. The co==1 case won on compute
        # (conv formulation runs at 1/128 lanes). Round-5 extends it to
        # co>1 (CasNet unit0/residual [3,3,3,1,16] stride-2) for a MEMORY
        # reason the standalone benches can't see: the conv formulation's
        # EmitAllBatchInSublanes emitter demands a batch-minor relayout of
        # the full-res C=1 activation — two 16.8 MB-logical copies that
        # write 1.07 GB PHYSICAL each (batch 2 in lanes = 64x tile padding,
        # copy.2112/2121 in the round-5 nonconv budget, ~38 ms/step at
        # 80-87% of HBM peak — at the roofline of a catastrophic layout).
        # The patch-matrix dot consumes the natural W-minor layout instead.
        # (Tap-einsum, A/B'd earlier, measured NEUTRAL: its [vox, 1]
        # columns re-trigger the same narrow-minor pathology.) Gated to
        # co <= 32: the discriminator's [1->64] block0 conv occupies half
        # the lanes already and showed no relayout in the budget.
        psym = tuple(p[0] for p in pads)
        xp = x
        if any(psym):
            xp = jnp.pad(
                x, ((0, 0),) + tuple((p, p) for p in psym) + ((0, 0),))
        return _wgrad_im2col_ci1(xp, dy, kernel_size, strides)
    if (_D_TAP_WGRAD and strides == (1, 1, 1) and ci >= 64
            and all(p == (0, 0) for p in pads)):
        # experimental route for the discriminator's stride-1 VALID wgrads
        # ([3,3,3,64,128]: the step's biggest single conv at ~30 TF/s in
        # the conv formulation): k^3 full-lane [ci, co] dots with K = all
        # voxels. Memory model: 27x re-read of both operands (~20 GB) =
        # ~24 ms at HBM peak vs the 57 ms/exec measured conv emitter.
        return _wgrad_tap_einsum(x, dy, kernel_size, strides)
    return _wgrad_conv(x, dy, kernel_size, strides, pads)


_CI1_DOT_ALL = True
_CI1_TAPS_MAJOR = False
_CI1_PALLAS = False
_D_TAP_WGRAD = False


def set_ci1_dot_all(enabled: bool) -> None:
    """A/B hook: route ALL Ci==1 wgrads (not just 1->1) through the
    im2col dot. Default on (measured win, see conv3d_wgrad docstring)."""
    global _CI1_DOT_ALL
    _CI1_DOT_ALL = bool(enabled)


def set_ci1_pallas(enabled: bool) -> None:
    """A/B hook: route the stride-1 SAME ci==1 wgrads through the Pallas
    single-pass tap-reduce kernel (no patch-matrix materialization at all).
    TPU-only (XLA route elsewhere); default off until chip-measured
    (BENCH_CI1_PALLAS=1)."""
    global _CI1_PALLAS
    _CI1_PALLAS = bool(enabled)


def set_ci1_taps_major(enabled: bool) -> None:
    """A/B hook: build the ci==1 / co==1 im2col patch matrices taps-major
    ([k^3, vox], vox in lanes) instead of taps-minor ([vox, k^3], k^3 in
    lanes with 27->128 tile padding). Same math, different physical bytes;
    default off until chip-measured (BENCH_CI1_TAPS_MAJOR=1)."""
    global _CI1_TAPS_MAJOR
    _CI1_TAPS_MAJOR = bool(enabled)


def set_d_tap_wgrad(enabled: bool) -> None:
    """A/B hook: tap-einsum for the wide stride-1 VALID wgrads (D blocks)."""
    global _D_TAP_WGRAD
    _D_TAP_WGRAD = bool(enabled)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_op(x, w, strides: Int3, pads):
    """conv_general_dilated(NDHWC, DHWIO) with barrier-scheduled gradients."""
    return _fwd_conv(x, w, strides, pads)


def _conv3d_op_fwd(x, w, strides, pads):
    return _fwd_conv(x, w, strides, pads), (x, w)


def _conv3d_op_bwd(strides, pads, res, g):
    x, w = res
    # Materialize the cotangent once: without this, XLA fuses the upstream
    # elementwise backward chain into BOTH gradient convolutions and
    # recomputes it per conv-tap access pattern (measured 2x on the v5e).
    (g,) = lax.optimization_barrier((g,))
    dx = conv3d_dgrad(g, w, strides, pads, x.shape[1:4])
    if _BARRIER_DX_OUT:
        # experimental: also fence the dgrad output from its elementwise
        # consumers (tpu_tests/barrier_experiment.py variants)
        (dx,) = lax.optimization_barrier((dx,))
    dw = conv3d_wgrad(x, g, w.shape[:3], strides, pads)
    return dx, dw


_BARRIER_DX_OUT = False


def set_barrier_dx_out(enabled: bool) -> None:
    global _BARRIER_DX_OUT
    _BARRIER_DX_OUT = bool(enabled)


conv3d_op.defvjp(_conv3d_op_fwd, _conv3d_op_bwd)


# -- trace-time toggle --------------------------------------------------------
# Consulted when a Conv3d layer is traced; set it BEFORE building/jitting a
# step (GANTrainer.__init__ sets it from TrainConfig.conv_grad_barrier).
_GRAD_BARRIER = True


def set_grad_barrier(enabled: bool) -> None:
    global _GRAD_BARRIER
    _GRAD_BARRIER = bool(enabled)


def grad_barrier_enabled() -> bool:
    return _GRAD_BARRIER


def conv3d(x, w, strides: Int3, pads):
    """Entry point used by models.layers.Conv3d: barrier-scheduled gradients
    when enabled, jax's default autodiff otherwise."""
    if _GRAD_BARRIER:
        return conv3d_op(x, w, tuple(strides), tuple(map(tuple, pads)))
    return _fwd_conv(x, w, strides, pads)


# -- transposed conv ----------------------------------------------------------

def _fwd_convT(x, kt, strides: Int3, pads):
    return lax.conv_general_dilated(
        x, kt, window_strides=(1, 1, 1), padding=pads,
        lhs_dilation=strides, dimension_numbers=_DIMN)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_transpose3d_op(x, kt, strides: Int3, pads):
    """The ConvTranspose3d forward (lhs-dilated conv on the flipped/swapped
    kernel, models/layers.py) with the same barrier-scheduled backward as
    conv3d_op. Gradients are jax's own (derived via jax.vjp of the plain
    formulation) — only the cotangent materialization point changes."""
    return _fwd_convT(x, kt, strides, pads)


def _convT_fwd(x, kt, strides, pads):
    return _fwd_convT(x, kt, strides, pads), (x, kt)


def _wgradT_co1(x, g, kernel_size: Int3, strides: Int3, pads):
    """dkt for the 1-output-channel ConvTranspose (every CasNet block's top
    up conv): dkt[t, ci, 0] = sum_{n,i} x[n,i,ci] * g[n, lo + s*i - t, 0].

    Expressed as k^3 strided slices of the PADDED single-channel cotangent
    stacked into a [vox, k^3] matrix and ONE MXU dot against the flat
    [vox, ci] input — the convT sibling of _wgrad_im2col_ci1. Avoids the
    conv formulation's batch-minor relayout of the full-res C=1 cotangent
    (copy.2121 in the round-5 nonconv budget: 16.8 MB logical written as
    1.07 GB physical, 64x tile padding) and never materializes dilate(x).
    """
    n = x.shape[0]
    ci = x.shape[-1]
    ins = x.shape[1:4]
    outs = g.shape[1:4]
    lo = tuple(p[0] for p in pads)
    # pad g so every tap's strided gather stays in bounds; out-of-range
    # output positions contribute exactly zero
    a = tuple(max(0, kernel_size[i] - 1 - lo[i]) for i in range(3))
    hi = tuple(max(0, lo[i] + strides[i] * (ins[i] - 1) - outs[i] + 1)
               for i in range(3))
    gp = jnp.pad(g, ((0, 0),) + tuple(
        (a[i], hi[i]) for i in range(3)) + ((0, 0),))
    cols = []
    for td, th, tw in _taps(kernel_size):
        starts = (lo[0] - td + a[0], lo[1] - th + a[1], lo[2] - tw + a[2])
        v = lax.slice(
            gp, (0, starts[0], starts[1], starts[2], 0),
            (n, starts[0] + (ins[0] - 1) * strides[0] + 1,
             starts[1] + (ins[1] - 1) * strides[1] + 1,
             starts[2] + (ins[2] - 1) * strides[2] + 1, 1),
            (1, strides[0], strides[1], strides[2], 1))
        cols.append(v.reshape(-1))
    xf = x.reshape(-1, ci)                            # [vox, ci]
    if _CI1_TAPS_MAJOR:
        # see _wgrad_im2col_ci1: vox-in-lanes stack + MXU-natural K minor
        gc = jnp.stack(cols, axis=0)                  # [k^3, vox]
        dkt = lax.dot_general(
            gc, xf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [k^3, ci]
    else:
        gc = jnp.stack(cols, axis=-1)                 # [vox, k^3]
        dkt = lax.dot_general(
            gc, xf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [k^3, ci]
    return dkt.reshape(*kernel_size, ci, 1).astype(g.dtype)


def _convT_bwd(strides, pads, res, g):
    x, kt = res
    (g,) = lax.optimization_barrier((g,))
    if kt.shape[-1] == 1 and _CI1_DOT_ALL and g.shape[-1] == 1:
        _, vjp_x = jax.vjp(
            lambda x_: _fwd_convT(x_, kt, strides, pads), x)
        (dx,) = vjp_x(g)
        dkt = _wgradT_co1(x, g, kt.shape[:3], strides, pads)
        return dx, dkt
    _, vjp = jax.vjp(lambda x_, kt_: _fwd_convT(x_, kt_, strides, pads),
                     x, kt)
    return vjp(g)


conv_transpose3d_op.defvjp(_convT_fwd, _convT_bwd)


def conv_transpose3d(x, kt, strides: Int3, pads):
    """Entry point used by models.layers.ConvTranspose3d."""
    if _GRAD_BARRIER:
        return conv_transpose3d_op(
            x, kt, tuple(strides), tuple(map(tuple, pads)))
    return _fwd_convT(x, kt, strides, pads)
