#!/usr/bin/env python
"""A/B: nn.scan over the 6 CasNet blocks vs python-unrolled, canonical step.

The train-step profile shows ~150 ms/step of dynamic-slice machinery from
the scanned parameter stacks plus scan-boundary copies. Unrolling trades
~6x HLO size / compile time for their removal and wider fusion scope.
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

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from minipig_gan_tpu.config import Config, GeneratorConfig, TrainConfig
from minipig_gan_tpu.train import GANTrainer

N_IT = 6


def run(use_scan: bool):
    cfg = Config(
        generator=GeneratorConfig(use_scan=use_scan, remat=False),
        train=TrainConfig(mode="gan", compute_dtype="bfloat16",
                          batch_size=4, accum_steps=2, reuse_g_forward=True),
    )
    tr = GANTrainer(cfg)
    rs = np.random.RandomState(0)
    t1 = np.tanh(rs.randn(4, 128, 128, 128, 1)).astype(np.float32)
    batch = {"t1w": jnp.asarray(t1),
             "t2w": jnp.asarray(np.clip(0.8 * t1 + 0.1, -1, 1))}
    state = tr.init_jit(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    t0 = time.time()
    step = jax.jit(tr.train_step, donate_argnums=0).lower(state, batch).compile()
    compile_s = time.time() - t0
    state, m = step(state, batch)
    float(m["g_loss"])

    def loop(state, n):
        t0 = time.time()
        for _ in range(n):
            state, m = step(state, batch)
        float(m["g_loss"])
        return state, time.time() - t0

    state, t1_ = loop(state, N_IT)
    state, t2_ = loop(state, 2 * N_IT)
    dt = max((t2_ - t1_) / N_IT, 1e-9)
    print(f"use_scan={use_scan}: {dt*1e3:7.1f} ms/step "
          f"({4*128/dt:.1f} slices/s)  compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["scan", "unroll"]):
        run(v == "scan")
