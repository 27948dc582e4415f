#!/usr/bin/env python
"""Real-TPU A/B: BN-folded eval forward, nn.scan vs unrolled blocks.

Training-side unrolling measured SLOWER (BENCH_NOTES round-4), but the
eval forward is a different animal: profiling shows it ~31% scan-boundary
layout copies (round-3), and the unrolled fwd-only HLO is small enough
that compile time stays reasonable. If unrolling wins here, serving takes
it (models/fold.py path) while training keeps the scan.

Usage: python tpu_tests/eval_unroll.py
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
from minipig_gan_tpu.config import Config, TrainConfig
from minipig_gan_tpu.models.fold import fold_batchnorm
from minipig_gan_tpu.train import GANTrainer

N_IT = 12


def timed_loop(fn, x, n_it=N_IT):
    @jax.jit
    def run(x):
        def body(i, carry):
            s, x = carry
            y = fn(x + (s * 1e-37).astype(x.dtype))
            return (jnp.sum(y, dtype=jnp.float32), x)
        s, _ = lax.fori_loop(0, n_it, body, (jnp.float32(0.0), x))
        return s
    s = run(x); s.block_until_ready()
    t0 = time.time(); s = run(x); s.block_until_ready()
    return (time.time() - t0) / n_it


def main():
    cfg = Config(train=TrainConfig(mode="generator_only",
                                   compute_dtype="bfloat16", batch_size=4))
    tr = GANTrainer(cfg)
    rs = np.random.RandomState(0)
    x = jnp.asarray(np.tanh(rs.randn(4, 128, 128, 128, 1)), jnp.bfloat16)
    state = tr.init_jit(jax.random.PRNGKey(0), {"t1w": x, "t2w": x})
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])

    folded = fold_batchnorm(state.g_params, state.g_stats)
    twin_scan = tr.generator.clone(norm=None)
    y_scan = jax.jit(lambda v: twin_scan.apply({"params": v}, x, train=False)
                     )(folded)

    twin_unroll = tr.generator.clone(norm=None, use_scan=False)
    stacked = folded["blocks"]["unet"]
    p_unroll = {
        f"block{i}": jax.tree.map(lambda a, i=i: a[i], stacked)
        for i in range(tr.generator.n_unet_blocks)
    }
    y_unroll = jax.jit(
        lambda v: twin_unroll.apply({"params": v}, x, train=False)
    )(p_unroll)
    err = float(jnp.max(jnp.abs(y_scan.astype(jnp.float32)
                                - y_unroll.astype(jnp.float32))))
    print(f"scan-vs-unroll fwd max|diff| = {err:.2e}", flush=True)

    t_scan = timed_loop(
        lambda x: twin_scan.apply({"params": folded}, x, train=False), x)
    t_unr = timed_loop(
        lambda x: twin_unroll.apply({"params": p_unroll}, x, train=False), x)
    print(f"scan:     {t_scan*1e3:7.2f} ms/batch4  "
          f"({4/t_scan:.1f} vols/s)", flush=True)
    print(f"unrolled: {t_unr*1e3:7.2f} ms/batch4  "
          f"({4/t_unr:.1f} vols/s)  speedup={t_scan/t_unr:.2f}x", flush=True)


if __name__ == "__main__":
    main()
