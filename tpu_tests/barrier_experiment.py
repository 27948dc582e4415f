#!/usr/bin/env python
"""Full-step A/B on the v5e: conv grad scheduling variants (ops/fastconv.py).

Canonical config: 6-block CasNet + global D, 128^3, bf16, batch 4, accum 2,
reuse_g. Baseline (barrier off) = 2312 ms / 221.3 slices/s (BENCH_NOTES).

Variants: on | off | dxout (also fence each dgrad output from its
elementwise consumers) | nodremat (barrier + discriminator.remat=False —
does materializing D activations beat refusing them into the wgrads?)

Usage: python tpu_tests/barrier_experiment.py [variant ...]
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
from minipig_gan_tpu.config import Config, TrainConfig
from minipig_gan_tpu.train import GANTrainer

N_IT = 6


def run(variant: str):
    from minipig_gan_tpu.config import DiscriminatorConfig
    from minipig_gan_tpu.ops import fastconv

    barrier = variant != "off"
    fastconv.set_barrier_dx_out(variant == "dxout")
    cfg = Config(
        discriminator=DiscriminatorConfig(remat=variant != "nodremat"),
        train=TrainConfig(
            mode="gan", compute_dtype="bfloat16", batch_size=4, accum_steps=2,
            reuse_g_forward=True, conv_grad_barrier=barrier,
            fused_step=variant == "fused"))
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
    mem = step.memory_analysis()
    peak = getattr(mem, "temp_size_in_bytes", 0) \
        + getattr(mem, "argument_size_in_bytes", 0)
    state, m = step(state, batch)
    g0 = float(m["g_loss"])

    def loop(state, n):
        t0 = time.time()
        for _ in range(n):
            state, m = step(state, batch)
        float(m["g_loss"])
        return state, time.time() - t0

    state, t1_ = loop(state, N_IT)
    state, t2_ = loop(state, 2 * N_IT)
    dt = max((t2_ - t1_) / N_IT, 1e-9)
    print(f"{variant}: {dt*1e3:7.1f} ms/step "
          f"({4*128/dt:.1f} slices/s)  compile={compile_s:.0f}s "
          f"temp+args={peak/2**30:.1f}GiB  g_loss@1={g0:.4f}", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["on", "off"]):
        run(v)
