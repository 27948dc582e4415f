#!/usr/bin/env python
"""Real-TPU timing: fastconv's routed wgrad formulations vs the swapped-conv
formulation, at the canonical step's tiny-channel wgrad shapes (the ones the
conv formulation runs at <2 TF/s; conv_budget.py round-4).

Usage: python tpu_tests/wgrad_formulations.py [case ...]
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
from minipig_gan_tpu.ops import fastconv

# name: (batch, spatial, ci, co, k, s, p)   in-step ms/exec noted
CASES = {
    "up_1x1": (2, 128, 1, 1, 3, 1, 1),      # 8.2 ms -> im2col route
    "in_1x16": (2, 128, 1, 16, 3, 1, 1),    # 3.2 ms -> im2col route
    "out_16x1": (2, 128, 16, 1, 3, 1, 1),   # 3.2 ms -> swap route
    "l1_16x16": (2, 64, 16, 16, 3, 1, 1),   # 2.0 ms -> tap einsum
    "down_16x32s2": (2, 64, 16, 32, 3, 2, 1),
    "l2_32x32": (2, 32, 32, 32, 3, 1, 1),
    "out_32x1": (2, 64, 32, 1, 3, 1, 1),
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
    n, sp, ci, co, k, s, p = CASES[name]
    o = (sp + 2 * p - k) // s + 1
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, sp, sp, sp, ci), jnp.bfloat16)
    dy = jnp.asarray(rs.randn(n, o, o, o, co), jnp.bfloat16)
    ks, ss, ps = (k,) * 3, (s,) * 3, ((p, p),) * 3

    ref = jax.jit(lambda a: fastconv._wgrad_conv(*a, ks, ss, ps))((x, dy))
    got = jax.jit(lambda a: fastconv.conv3d_wgrad(*a, ks, ss, ps))((x, dy))
    r32, g32 = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    err = float(np.max(np.abs(r32 - g32))) / max(float(np.max(np.abs(r32))),
                                                 1e-9)
    t_c = timed_loop(lambda a: fastconv._wgrad_conv(*a, ks, ss, ps), (x, dy))
    t_r = timed_loop(lambda a: fastconv.conv3d_wgrad(*a, ks, ss, ps), (x, dy))
    print(f"{name:14s} rel_err={err:8.1e}  conv={t_c*1e3:7.2f} ms  "
          f"routed={t_r*1e3:7.2f} ms  speedup={t_c/t_r:5.2f}x", flush=True)


if __name__ == "__main__":
    for c in (sys.argv[1:] or list(CASES)):
        try:
            run_case(c)
        except Exception as e:
            print(f"{c:14s} FAILED: {str(e).splitlines()[0][:180]}",
                  flush=True)
