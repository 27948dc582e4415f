#!/usr/bin/env python
"""Op-level A/B: XLA conv gradients vs restructured formulations, on chip.

The step profile (profile_step.py + attribute_ops.py) shows two gradient
pathologies dominating the canonical GAN step:

1. dgrad of the stride-2 convs is compiled as an `lhs_dilate=2` convolution
   (e.g. D block2 128->256 k4 s2 at 124^3: ~70 ms each) — half the MAC taps
   multiply interleaved zeros. Polyphase decomposition splits dx into the
   s^3 output phases; each phase is a dense stride-1 conv with the matching
   kernel-tap subset: exactly s^3 = 8x fewer MACs.

2. wgrad of the 1<->16-channel CasNet convs is compiled as a
   [3,3,3,cin,cout] "convolution" whose contraction runs over batch+spatial
   with 1-16 lanes occupied (e.g. the up-path 16->1 conv at 128^3: 8 ms per
   execution, 27 GFLOP/s). An im2col dot_general reformulates it as a
   [27*cin, voxels] x [voxels, cout] matmul — contraction in lanes.

This experiment validates both rewrites numerically against jax.grad and
times them with the self-feeding-loop trick (BENCH_NOTES round-3: repeated
identical dispatches short-circuit on the tunneled backend).

Usage: python tpu_tests/convgrad_experiment.py [case ...]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DIMN = ("NDHWC", "DHWIO", "NDHWC")


def conv_fwd(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=[(pad, pad)] * 3,
        dimension_numbers=DIMN)


# ---------------------------------------------------------------- polyphase
def dgrad_xla(dy, w, stride, pad, in_spatial):
    """Reference dgrad: what jax.grad produces (lhs-dilated conv)."""
    k = w.shape[0]
    lo = k - 1 - pad
    i, s = in_spatial, stride
    o = (i + 2 * pad - k) // s + 1
    # dilated dy size = (o-1)*s + 1; out = dil + lo + hi - k + 1 == i
    hi = i + k - 1 - ((o - 1) * s + 1) - lo
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)  # DHW, out->in
    return lax.conv_general_dilated(
        dy, wt, window_strides=(1, 1, 1), padding=[(lo, hi)] * 3,
        lhs_dilation=(s,) * 3, dimension_numbers=DIMN)


def dgrad_polyphase(dy, w, stride, pad, in_spatial):
    """dx for a VALID/SAME stride-s conv, as s^3 dense stride-1 convs.

    dx[p] = sum_{t = s*m + (p+pad) mod s} dy[(p + pad - t)/s] w[t]
    Phase r = (p + pad) mod s; q = (p + pad - r) / s.
    dx_r[q] = sum_m dy[q - m] w[s*m + r]  (dy zero outside [0, O)).
    """
    s, k, i = stride, w.shape[0], in_spatial
    o = (i + 2 * pad - k) // s + 1
    phases = []
    # per-phase tap counts and conv
    for r in range(s):
        taps = list(range(r, k, s))          # t = r, r+s, ...
        m_max = len(taps)                    # m in [0, m_max)
        # q range for this phase: p = s*q + r - pad, p in [0, i)
        # q in [ceil((pad - r)/s) ... ) — for pad < s this is q >= 0 when
        # r >= pad else q >= 1... keep it general with q0:
        q0 = -((r - pad) // s) if (r - pad) < 0 else 0
        n_q = (i - 1 + pad - r) // s - q0 + 1
        phases.append((r, taps, m_max, q0, n_q))

    def phase_conv(dy, r, taps, m_max, q0, n_q):
        # out[q'] = sum_j dyp[q' + j] K[j], want sum_m dy[q0 + q' - m] w[s*m+r]
        # pad dy so index q0 + q' - m valid: lead pad = m_max - 1 + max(0,-q0)
        # trailing: (q0 + n_q - 1) may exceed o-1
        lead = m_max - 1 - q0
        trail = max(0, q0 + n_q - 1 - (o - 1))
        # conv VALID over padded dy with window m_max gives
        # out[q'] = sum_j dy[q' - lead + j] K[j]; set j = m_max-1-m =>
        # K[j] = w[s*(m_max-1-j) + r]
        sub = w[jnp.array(taps[::-1])]       # [m_max, kh, kw, ci, co] axis0
        return sub, lead, trail

    outs = np.empty((s, s, s), dtype=object)
    for rd, taps_d, md, q0d, nqd in [phases[j] for j in range(s)]:
        subd_idx = np.array(list(range(rd, k, s))[::-1])
        for rh, taps_h, mh, q0h, nqh in [phases[j] for j in range(s)]:
            subh_idx = np.array(list(range(rh, k, s))[::-1])
            for rw, taps_w, mw, q0w, nqw in [phases[j] for j in range(s)]:
                subw_idx = np.array(list(range(rw, k, s))[::-1])
                sub = w[subd_idx][:, subh_idx][:, :, subw_idx]
                subt = sub.swapaxes(3, 4)    # out<->in for the return pass
                pads = []
                for (mm, qq0, nn) in ((md, q0d, nqd), (mh, q0h, nqh),
                                      (mw, q0w, nqw)):
                    lead = mm - 1 - qq0
                    trail = max(0, qq0 + nn - 1 - (o - 1))
                    pads.append((lead, trail))
                ph = lax.conv_general_dilated(
                    dy, subt, window_strides=(1, 1, 1), padding=pads,
                    dimension_numbers=DIMN)
                outs[rd, rh, rw] = ph
    # interleave phases: dx[p] with p = s*q + r - pad
    # all phases have n_q sizes; stack and reshape when equal, else dus.
    n_qs = {phases[j][4] for j in range(s)}
    ci = w.shape[3]
    n = dy.shape[0]
    if len(n_qs) == 1 and all(phases[j][3] == 0 for j in range(s)) and pad == 0:
        nq = n_qs.pop()
        # dx[s*q + r] = out[r][q] -> shape [n, nq, s, nq, s, nq, s, ci]
        st = jnp.stack([jnp.stack([jnp.stack([outs[rd, rh, rw]
                                              for rw in range(s)], axis=3)
                                   for rh in range(s)], axis=2)
                        for rd in range(s)], axis=1)
        # st: [n, sd, qd, sh, qh, sw, qw, ci] -> transpose to interleave
        st = st.transpose(0, 2, 1, 4, 3, 6, 5, 7)
        dx = st.reshape(n, s * nq, s * nq, s * nq, ci)
        return dx[:, :in_spatial, :in_spatial, :in_spatial, :]
    # general fallback: scatter phases (not needed for the benched cases)
    dx = jnp.zeros((n, in_spatial, in_spatial, in_spatial, ci), dy.dtype)
    for rd in range(s):
        for rh in range(s):
            for rw in range(s):
                pd = phases[rd]; ph_ = phases[rh]; pw = phases[rw]
                block = outs[rd, rh, rw]
                d0 = pd[0] - pad + s * pd[3]
                h0 = ph_[0] - pad + s * ph_[3]
                w0 = pw[0] - pad + s * pw[3]
                dx = dx.at[:, d0::s, h0::s, w0::s, :].set(
                    block[:, : (in_spatial - d0 + s - 1) // s,
                          : (in_spatial - h0 + s - 1) // s,
                          : (in_spatial - w0 + s - 1) // s, :])
    return dx


# ---------------------------------------------------------------- im2col wgrad
def wgrad_xla(x, dy, stride, pad, k):
    """What jax.grad produces: conv over batch dim."""
    def f(w):
        return jnp.sum(conv_fwd(x, w, stride, pad) * dy)
    ci, co = x.shape[-1], dy.shape[-1]
    w0 = jnp.zeros((k, k, k, ci, co), x.dtype)
    return jax.grad(f)(w0)


def wgrad_im2col(x, dy, stride, pad, k):
    """dw[t, ci, co] = sum_{n, o} x[n, s*o + t - pad, ci] dy[n, o, co]
    as one [k^3*ci, voxels] x [voxels, co] matmul (contraction in lanes)."""
    n, i = x.shape[0], x.shape[1]
    co = dy.shape[-1]
    ci = x.shape[-1]
    o = (i + 2 * pad - k) // stride + 1
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)))
    # gather k^3 shifted strided views: [n, o,o,o, k,k,k, ci]
    cols = []
    for td in range(k):
        for th in range(k):
            for tw in range(k):
                v = lax.slice(
                    x, (0, td, th, tw, 0),
                    (n, td + (o - 1) * stride + 1, th + (o - 1) * stride + 1,
                     tw + (o - 1) * stride + 1, ci),
                    (1, stride, stride, stride, 1))
                cols.append(v)
    xc = jnp.stack(cols, axis=4)             # [n, o,o,o, k^3, ci]
    xc = xc.reshape(n * o * o * o, k * k * k * ci)
    dyf = dy.reshape(n * o * o * o, co)
    dw = lax.dot_general(
        xc, dyf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [k^3*ci, co]
    return dw.reshape(k, k, k, ci, co).astype(x.dtype)


# ---------------------------------------------------------------- harness
def timed_loop(fn, args, n_it=12):
    """Self-feeding timed loop in ONE jit call (defeats dispatch
    short-circuiting; keeps full-tensor fetches out of the timed region)."""
    @jax.jit
    def run(args):
        def body(i, carry):
            s, a = carry
            # data-dependent, numerically-negligible perturbation in the
            # input dtype: defeats CSE/short-circuit without changing values
            a0 = a[0] + (s * 1e-37).astype(a[0].dtype)
            out = fn((a0,) + a[1:])
            # consume the WHOLE output (a single element lets XLA slice
            # backward through the conv and skip ~all the work — measured
            # "654 TF/s"); the full reduce costs one extra HBM read.
            return (jnp.sum(out, dtype=jnp.float32), a)
        s, _ = lax.fori_loop(0, n_it, body, (jnp.float32(0.0), args))
        return s
    s = run(args)
    s.block_until_ready()
    t0 = time.time()
    s = run(args)
    s.block_until_ready()
    return (time.time() - t0) / n_it


CASES = {
    # name: (batch, spatial, cin, cout, k, stride, pad)
    "d_block2_dgrad": (2, 124, 128, 256, 4, 2, 0),
    "d_block3_dgrad": (2, 61, 256, 256, 4, 2, 0),
    "unet_down_dgrad": (2, 128, 16, 32, 3, 2, 1),
    "casnet_up_wgrad": (2, 128, 16, 1, 3, 1, 1),
    "casnet_in_wgrad": (2, 128, 1, 16, 3, 1, 1),
}


def run_case(name):
    n, i, ci, co, k, s, pad = CASES[name]
    rs = np.random.RandomState(0)
    o = (i + 2 * pad - k) // s + 1
    dt = jnp.bfloat16
    x = jnp.asarray(rs.randn(n, i, i, i, ci), dt)
    dy = jnp.asarray(rs.randn(n, o, o, o, co), dt)
    w = jnp.asarray(rs.randn(k, k, k, ci, co) * 0.1, dt)

    if name.endswith("dgrad"):
        ref = jax.jit(lambda dy, w: dgrad_xla(dy, w, s, pad, i))(dy, w)
        new = jax.jit(lambda dy, w: dgrad_polyphase(dy, w, s, pad, i))(dy, w)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - new.astype(jnp.float32))))
        t_ref = timed_loop(lambda a: dgrad_xla(a[0], a[1], s, pad, i), (dy, w))
        t_new = timed_loop(
            lambda a: dgrad_polyphase(a[0], a[1], s, pad, i), (dy, w))
    else:
        ref = jax.jit(lambda x, dy: wgrad_xla(x, dy, s, pad, k))(x, dy)
        new = jax.jit(lambda x, dy: wgrad_im2col(x, dy, s, pad, k))(x, dy)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - new.astype(jnp.float32))))
        denom = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        err /= denom
        t_ref = timed_loop(lambda a: wgrad_xla(a[0], a[1], s, pad, k), (x, dy))
        t_new = timed_loop(
            lambda a: wgrad_im2col(a[0], a[1], s, pad, k), (x, dy))
    print(f"{name:18s} err={err:9.2e}  xla={t_ref*1e3:8.2f} ms  "
          f"new={t_new*1e3:8.2f} ms  speedup={t_ref/max(t_new,1e-9):5.2f}x",
          flush=True)


if __name__ == "__main__":
    for c in (sys.argv[1:] or list(CASES)):
        try:
            run_case(c)
        except Exception as e:
            print(f"{c:18s} FAILED: {str(e).splitlines()[0][:160]}",
                  flush=True)
