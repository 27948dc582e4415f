#!/usr/bin/env python
"""Serving throughput sweep: BN-folded generator inference vs batch size.

The bench headline reports batch-4 inference; serving deployments pick the
batch that maximizes vols/s under their latency budget — this sweep gives
the curve (one v5e chip, 128^3 volumes, bf16, folded BN).

Usage: python tpu_tests/infer_batch_sweep.py [batches...]
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
from minipig_gan_tpu.train import GANTrainer

N_IT = 10


def main(batches):
    cfg = Config(train=TrainConfig(mode="generator_only",
                                   compute_dtype="bfloat16", batch_size=1))
    tr = GANTrainer(cfg)
    x1 = jnp.zeros((1, 128, 128, 128, 1), jnp.float32)
    state = tr.init_jit(jax.random.PRNGKey(0), {"t1w": x1, "t2w": x1})
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    fast = tr.make_fast_generator(state)
    rs = np.random.RandomState(0)

    for b in batches:
        x = jnp.asarray(np.tanh(rs.randn(b, 128, 128, 128, 1)), jnp.bfloat16)

        @jax.jit
        def run(x):
            def body(i, carry):
                s, x = carry
                y = fast(x + (s * 1e-37).astype(x.dtype))
                return (jnp.sum(y, dtype=jnp.float32), x)
            s, _ = lax.fori_loop(0, N_IT, body, (jnp.float32(0.0), x))
            return s

        try:
            s = run(x); s.block_until_ready()
            t0 = time.time(); s = run(x); s.block_until_ready()
            dt = (time.time() - t0) / N_IT
            print(f"batch {b:3d}: {dt*1e3:8.2f} ms/batch  "
                  f"{b/dt:6.2f} vols/s  {b*128/dt:7.0f} slices/s", flush=True)
        except Exception as e:
            print(f"batch {b:3d}: FAILED {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16])
