#!/usr/bin/env python
"""Real-TPU parity + timing for the Ci==1 wgrad formulations.

Compares, at the canonical step's Ci==1 wgrad shapes:
  conv    — XLA swapped-conv formulation (fastconv._wgrad_conv)
  im2col  — XLA [vox, k^3] patch-matrix dot (fastconv._wgrad_im2col_ci1)
  tap     — XLA per-tap einsum (fastconv._wgrad_tap_einsum)
  flat    — hybrid XLA-im2col + Pallas streaming dot (pallas/wgrad_flat.py)

Timing uses the fori_loop self-feeding harness (input perturbed by the
running sum each iteration) — the ONLY pattern that defeats both the
tunnel's identical-dispatch short-circuit and XLA slicing away unconsumed
work (BENCH_NOTES round-3/4 measurement traps; a plain python loop over
jit calls with constant args measured this file's kernels at a fantastical
0.03 ms).

Usage: python tpu_tests/wgrad_flat_bench.py [case ...]
"""

from __future__ import annotations

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
from minipig_gan_tpu.ops.fastconv import (
    _wgrad_conv, _wgrad_im2col_ci1, _wgrad_tap_einsum,
)
from minipig_gan_tpu.ops.pallas.wgrad_flat import conv3d_wgrad_ci1_flat

# name: (batch, (D,H,W), co, k, pad) — all ci=1, stride 1
CASES = {
    "casnet_unit0_1x16": (2, (128, 128, 128), 16, 3, 1),   # x12/step + res
    "casnet_fused_1x32": (2, (128, 128, 128), 32, 3, 1),   # unit0+res concat
    "d_block0_1x64": (2, (128, 128, 128), 64, 3, 0),       # x4/step
}


def timed_loop(fn, args, n_it=12):
    @jax.jit
    def run(args):
        def body(i, carry):
            s, a = carry
            a0 = a[0] + (s * 1e-37).astype(a[0].dtype)
            out = fn((a0,) + a[1:])
            return (jnp.sum(out, dtype=jnp.float32), a)
        s, _ = lax.fori_loop(0, n_it, body, (jnp.float32(0.0), args))
        return s
    s = run(args); s.block_until_ready()
    t0 = time.time(); s = run(args); s.block_until_ready()
    return (time.time() - t0) / n_it


def run_case(name):
    n, (d, h, w), co, k, p = CASES[name]
    o = [e + 2 * p - k + 1 for e in (d, h, w)]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, d, h, w, 1), jnp.bfloat16)
    dy = jnp.asarray(rs.randn(n, *o, co), jnp.bfloat16)
    ks, ss = (k,) * 3, (1, 1, 1)
    pads = ((p, p),) * 3

    def padded(a):
        return jnp.pad(a[0], ((0, 0),) + ((p, p),) * 3 + ((0, 0),)) \
            if p else a[0]

    fns = {
        "conv": lambda a: _wgrad_conv(a[0], a[1], ks, ss, pads),
        "im2col": lambda a: _wgrad_im2col_ci1(padded(a), a[1], ks, ss),
        "tap": lambda a: _wgrad_tap_einsum(padded(a), a[1], ks, ss),
        "flat": lambda a: conv3d_wgrad_ci1_flat(a[0], a[1], ks, ss, pads),
    }
    ref = np.asarray(jax.jit(fns["conv"])((x, dy)), np.float32)
    scale = max(np.max(np.abs(ref)), 1e-9)
    flops = 2 * n * o[0] * o[1] * o[2] * co * k ** 3
    line = [f"{name:18s}"]
    for fname, fn in fns.items():
        got = np.asarray(jax.jit(fn)((x, dy)), np.float32)
        err = float(np.max(np.abs(ref - got))) / scale
        t = timed_loop(fn, (x, dy))
        line.append(f"{fname}={t*1e3:6.2f}ms({flops/t/1e12:4.1f}TF/s,"
                    f"e{err:.0e})")
    print("  ".join(line), flush=True)


if __name__ == "__main__":
    for c in (sys.argv[1:] or list(CASES)):
        run_case(c)
