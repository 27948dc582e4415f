#!/usr/bin/env python
"""Real-TPU parity + timing: Pallas conv3d wgrad kernel vs the XLA conv
formulation, at the canonical step's actual wgrad shapes (conv_budget.py).

Usage: python tpu_tests/wgrad_bench.py [case ...]
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
from minipig_gan_tpu.ops.pallas.wgrad_kernel import (
    conv3d_wgrad_pallas, conv3d_wgrad_supported, conv3d_wgrad_xla,
)

# name: (batch, (D,H,W), ci, co, k, s, p)  — in-step occurrences noted
CASES = {
    "d_block1_64x128": (2, (126, 126, 126), 64, 128, 3, 1, 0),  # 114 ms/step
    "d_block2_128x256": (2, (124, 124, 124), 128, 256, 4, 2, 0),  # 89 ms/step
    "d_block3_256x256": (2, (61, 61, 61), 256, 256, 4, 2, 0),
    "unet_l1_16x16": (2, (64, 64, 64), 16, 16, 3, 1, 1),  # 48 ms/step
    "unet_down_16x32": (2, (64, 64, 64), 16, 32, 3, 2, 1),
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
    n, (d, h, w), ci, co, k, s, p = CASES[name]
    o = [(e + 2 * p - k) // s + 1 for e in (d, h, w)]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, d, h, w, ci), jnp.bfloat16)
    dy = jnp.asarray(rs.randn(n, *o, co), jnp.bfloat16)
    ks, ss, ps = (k,) * 3, (s,) * 3, (p,) * 3
    assert conv3d_wgrad_supported(x.shape, dy.shape, ks, ss, ps), name

    ref = jax.jit(lambda a: conv3d_wgrad_xla(*a, ks, ss, ps))((x, dy))
    got = jax.jit(lambda a: conv3d_wgrad_pallas(*a, ks, ss, ps))((x, dy))
    ref32 = np.asarray(ref, np.float32)
    got32 = np.asarray(got, np.float32)
    scale = max(np.max(np.abs(ref32)), 1e-9)
    err = float(np.max(np.abs(ref32 - got32))) / scale
    t_x = timed_loop(lambda a: conv3d_wgrad_xla(*a, ks, ss, ps), (x, dy))
    t_p = timed_loop(lambda a: conv3d_wgrad_pallas(*a, ks, ss, ps), (x, dy))
    flops = 2 * n * o[0] * o[1] * o[2] * ci * co * k ** 3
    print(f"{name:18s} rel_err={err:8.1e}  xla={t_x*1e3:7.2f} ms "
          f"({flops/t_x/1e12:5.1f} TF/s)  pallas={t_p*1e3:7.2f} ms "
          f"({flops/t_p/1e12:5.1f} TF/s)  speedup={t_x/t_p:5.2f}x",
          flush=True)


if __name__ == "__main__":
    for c in (sys.argv[1:] or list(CASES)):
        try:
            run_case(c)
        except Exception as e:
            print(f"{c:18s} FAILED: {str(e).splitlines()[0][:180]}",
                  flush=True)
