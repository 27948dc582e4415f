#!/usr/bin/env python
"""Real-TPU experiment: remat vs accum trade for the canonical GAN step.

Full per-UNet-block remat (models/casnet.py) costs ~one extra generator
forward per backward. If activations fit HBM at a higher accum count with
remat OFF, the step may be faster despite more scan iterations. This script
measures the candidates and prints a table; the winner informs the bench
default (BENCH_NOTES.md).

Usage: python tpu_tests/remat_experiments.py [variant ...]
  variant = name from VARIANTS (default: all)
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

SPATIAL = 128
N_STEPS = 6

# name -> (g_remat, accum, reuse_g, d_remat)
VARIANTS = {
    "remat_accum2": (True, 2, True, True),
    "remat_accum4": (True, 4, True, True),
    "noremat_accum2": (False, 2, True, True),
    "noremat_accum4": (False, 4, True, True),
    "noremat_accum8": (False, 8, True, True),
    "remat_accum1": (True, 1, True, True),
    "noremat_accum1": (False, 1, True, True),
    "noremat_accum2_strict": (False, 2, False, True),
    "noremat_gd_accum2": (False, 2, True, False),
    "noremat_gd_accum1": (False, 1, True, False),
}


def run(name: str, remat: bool, accum: int, reuse_g: bool, d_remat: bool = True):
    from minipig_gan_tpu.config import DiscriminatorConfig
    cfg = Config(
        generator=GeneratorConfig(remat=remat),
        discriminator=DiscriminatorConfig(remat=d_remat),
        train=TrainConfig(mode="gan", compute_dtype="bfloat16",
                          batch_size=8 if accum == 8 else 4,
                          accum_steps=accum, reuse_g_forward=reuse_g),
    )
    b = cfg.train.batch_size
    rs = np.random.RandomState(0)
    t1 = np.tanh(rs.randn(b, SPATIAL, SPATIAL, SPATIAL, 1)).astype(np.float32)
    t2 = np.clip(0.8 * t1 + 0.1, -1, 1).astype(np.float32)
    batch = {"t1w": jnp.asarray(t1), "t2w": jnp.asarray(t2)}
    tr = GANTrainer(cfg)
    state = tr.init_jit(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    t0 = time.time()
    step = jax.jit(tr.train_step, donate_argnums=0).lower(state, batch).compile()
    compile_s = time.time() - t0
    mem = step.memory_analysis()
    peak = getattr(mem, "temp_size_in_bytes", 0) + getattr(mem, "argument_size_in_bytes", 0)
    state, metrics = step(state, batch)
    float(metrics["g_loss"])

    def timed(state, n):
        t0 = time.time()
        for _ in range(n):
            state, metrics = step(state, batch)
        float(metrics["g_loss"])
        return state, time.time() - t0

    state, t_n = timed(state, N_STEPS)
    state, t_2n = timed(state, 2 * N_STEPS)
    dt = max((t_2n - t_n) / N_STEPS, 1e-9)
    print(f"{name:18s} batch={b} ms/step={dt*1e3:8.1f} "
          f"slices/s={b*SPATIAL/dt:7.1f} compile={compile_s:5.1f}s "
          f"temp+args={peak/2**30:.1f}GiB", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        try:
            run(n, *VARIANTS[n])
        except Exception as e:
            msg = str(e)
            short = msg.splitlines()[0][:140] if msg else repr(e)
            print(f"{n:18s} FAILED: {short}", flush=True)
