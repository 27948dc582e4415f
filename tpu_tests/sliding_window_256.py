#!/usr/bin/env python
"""Real-TPU capability demo: 256^3 whole-volume inference via sliding
window — the reference's dormant >128^3 hook
(/root/reference/code/GAN/minipig_inference.py:110-114) made real at a
resolution whose activations would not fit a single forward.

Runs the canonical BN-folded generator over a 256^3 synthetic T1 with
128^3 ROIs (gaussian blending), on the chip, and reports wall time +
output sanity. Numbers land in BENCH_NOTES.md.

Usage: python tpu_tests/sliding_window_256.py [spatial=256] [roi=128]
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
from minipig_gan_tpu.ops.sliding_window import sliding_window_inference
from minipig_gan_tpu.train import GANTrainer


def main(spatial: int, roi: int) -> None:
    cfg = Config(train=TrainConfig(mode="generator_only",
                                   compute_dtype="bfloat16", batch_size=1))
    tr = GANTrainer(cfg)
    x_small = jnp.zeros((1, roi, roi, roi, 1), jnp.float32)
    state = tr.init_jit(jax.random.PRNGKey(0),
                        {"t1w": x_small, "t2w": x_small})
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    fast = tr.make_fast_generator(state)

    rs = np.random.RandomState(0)
    vol = np.tanh(rs.randn(spatial, spatial, spatial, 1)).astype(np.float32)
    x = jnp.asarray(vol)

    def run(x):
        return sliding_window_inference(
            x, (roi,) * 3, lambda v: fast(v), sw_batch_size=1,
            overlap=0.25, mode="gaussian")

    y = run(x)
    y.block_until_ready()
    t0 = time.time()
    y = run(x)
    y.block_until_ready()
    dt = time.time() - t0
    y_np = np.asarray(y, np.float32)
    n_win = 0
    from minipig_gan_tpu.ops.sliding_window import window_starts
    n_win = int(np.prod([len(window_starts(spatial, roi, 0.25))] * 3))
    print(f"{spatial}^3 via {roi}^3 ROIs x{n_win}: {dt:.2f} s "
          f"({spatial / dt:.1f} slices/s)  out range "
          f"[{y_np.min():.3f}, {y_np.max():.3f}]  shape {y_np.shape}",
          flush=True)
    assert y_np.shape == vol.shape
    assert -1.01 <= y_np.min() and y_np.max() <= 1.01


def parity(spatial: int, roi: int) -> None:
    """Sliding-window vs dense parity at a size where BOTH fit on chip
    (VERDICT r3 item 5): run the same BN-folded generator densely over the
    whole volume and via ROI windows with gaussian blending, and quantify
    the blending error. A conv generator windowed at roi < spatial is NOT
    bit-equal to the dense forward (each window sees zero padding at its
    own borders where the dense pass sees real context); the gaussian
    blend suppresses exactly those border voxels, so the disagreement
    concentrates in a thin interior band and its magnitude is the honest
    cost of the >HBM inference path. Output scale is tanh [-1, 1]."""
    cfg = Config(train=TrainConfig(mode="generator_only",
                                   compute_dtype="bfloat16", batch_size=1))
    tr = GANTrainer(cfg)
    x_small = jnp.zeros((1, roi, roi, roi, 1), jnp.float32)
    state = tr.init_jit(jax.random.PRNGKey(0),
                        {"t1w": x_small, "t2w": x_small})
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    fast = tr.make_fast_generator(state)

    rs = np.random.RandomState(0)
    vol = np.tanh(rs.randn(spatial, spatial, spatial, 1)).astype(np.float32)
    x = jnp.asarray(vol)

    dense = np.asarray(fast(x[None])[0], np.float32)
    windowed = np.asarray(sliding_window_inference(
        x, (roi,) * 3, lambda v: fast(v), sw_batch_size=1,
        overlap=0.5, mode="gaussian"), np.float32)

    diff = np.abs(dense - windowed)
    c = spatial // 4  # central region: every window border fully interior
    core = diff[c:-c, c:-c, c:-c]
    print(f"parity {spatial}^3 dense vs {roi}^3-ROI sliding window "
          f"(overlap 0.5, gaussian): MAE {diff.mean():.4f}  "
          f"max {diff.max():.4f}  core MAE {core.mean():.4f}  "
          f"core max {core.max():.4f}  (tanh scale [-1,1])", flush=True)
    assert diff.mean() < 0.05, "blending error out of family"


if __name__ == "__main__":
    if "--parity" in sys.argv:
        sys.argv.remove("--parity")
        parity(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
               int(sys.argv[2]) if len(sys.argv) > 2 else 64)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
             int(sys.argv[2]) if len(sys.argv) > 2 else 128)
