"""Single-chip 256^3 TRAINING step measurement (VERDICT round-2 item 9).

The >HBM story so far: 256^3 inference runs via sliding windows (5.8 s/vol,
tpu_tests/sliding_window_256.py) and 256^3 training is CPU-proven under
spatial=4 sharding + remat (tests/test_sharding_extended.py history). This
experiment answers the open single-chip question: can ONE v5e train at
256^3, and at what cost?

Candidate configs, tried in order (first fit wins; all bf16, batch 1):
  1. patch mode (config 3): full-volume 256^3 generator fwd/bwd + patch
     discriminator on 128 x 16^3 crops — the reference's own scaling hook
     (test_runs/GAN.py patches) applied to the >HBM volume; G remat on.
  2. generator_only 256^3 with remat — the L1 slice (no D).
  3. strict gan mode with global D — expected over-HBM (the D's
     full-resolution VALID convs at 256^3 dwarf 128^3's footprint); kept to
     RECORD the failure mode.

Prints one line per config: ms/step (differential timing — see bench.py
notes on tunneled-backend sync), HBM from compiled memory analysis, and
slices/s (256 slices/vol at 256^3).

Usage (on the chip): python tpu_tests/train_256_experiment.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax

    if os.environ.get("MINIPIG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MINIPIG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    import jax.numpy as jnp
    import numpy as np

    from minipig_gan_tpu.config import (
        Config, GeneratorConfig, PatchConfig, TrainConfig,
    )
    from minipig_gan_tpu.train import GANTrainer

    # EXP_SPATIAL accepts a comma-separated sweep (round-3: all three 256^3
    # +remat programs crash the relay's remote-compile helper subprocess
    # with HTTP 500 / exit 1 while the same programs compile and run on the
    # CPU mesh — the sweep locates the infrastructure ceiling and records
    # the largest single-chip-trainable volume on the way)
    spatials = [int(s) for s in
                os.environ.get("EXP_SPATIAL", "256").split(",")]
    n_steps = int(os.environ.get("EXP_STEPS", "4"))

    configs = [
        ("patch+remat", Config(
            generator=GeneratorConfig(remat=True),
            patch=PatchConfig(),
            train=TrainConfig(mode="patch", compute_dtype="bfloat16",
                              batch_size=1, accum_steps=1))),
        ("generator_only+remat", Config(
            generator=GeneratorConfig(remat=True),
            train=TrainConfig(mode="generator_only",
                              compute_dtype="bfloat16",
                              batch_size=1, accum_steps=1))),
        ("gan(global D)+remat", Config(
            generator=GeneratorConfig(remat=True),
            train=TrainConfig(mode="gan", compute_dtype="bfloat16",
                              batch_size=1, accum_steps=1))),
    ]

    for spatial in spatials:
      rs = np.random.RandomState(0)
      vol = np.tanh(
          rs.randn(1, spatial, spatial, spatial, 1)).astype(np.float32)
      batch = {"t1w": jnp.asarray(vol),
               "t2w": jnp.asarray(np.clip(0.8 * vol + 0.1, -1, 1))}
      for name, cfg in configs:
        name = f"{spatial}^3 {name}"
        try:
            tr = GANTrainer(cfg)
            state = tr.init_jit(jax.random.PRNGKey(0), batch)
            jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
            t0 = time.time()
            compiled = jax.jit(tr.train_step, donate_argnums=0).lower(
                state, batch).compile()
            compile_s = time.time() - t0
            hbm = ""
            try:
                ma = compiled.memory_analysis()
                hbm = (f" temp={ma.temp_size_in_bytes/2**30:.1f}G"
                       f" args={ma.argument_size_in_bytes/2**30:.1f}G")
            except Exception:
                pass
            state, m = compiled(state, batch)
            float(m["g_loss"])

            def timed(state, n):
                t0 = time.time()
                for _ in range(n):
                    state, m = compiled(state, batch)
                float(m["g_loss"])
                return state, time.time() - t0

            state, t_n = timed(state, n_steps)
            state, t_2n = timed(state, 2 * n_steps)
            dt = max((t_2n - t_n) / n_steps, 1e-9)
            print(f"{name}: {dt*1e3:.0f} ms/step "
                  f"({spatial/dt:.1f} slices/s/chip){hbm} "
                  f"compile={compile_s:.0f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED — {str(e).splitlines()[0][:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
