"""Cross-species (minipig) transfer inference.

Reproduces /root/reference/code/GAN/minipig_inference.py: identical
human-trained generator weights, but the preprocessing resamples onto the
MINIPIG policy grid — the image's own direction and physical extent
(transforms2.py:148-172) — instead of the human canonical 256mm grid; the
generated T2 is written back with that grid's metadata (:122-128).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.nifti import read_nifti, write_nifti
from ..data.pipeline import percentile_normalize_numpy
from ..ops.resample import minipig_native_grid, resample_numpy
from ..train.checkpoints import load_config
from .inference import load_trainer_state


def run_minipig_inference(
    ckpt_path,
    t1_path: str,
    out_dir: Optional[str] = None,
    cfg: Optional[Config] = None,
    sliding_window: Optional[tuple] = None,
    sw_overlap: float = 0.25,
) -> str:
    """Single minipig T1 -> generated T2 NIfTI; returns the output path.

    `sliding_window=(rz, ry, rx)` runs the generator over overlapping ROI
    windows with gaussian blending instead of one whole-volume forward —
    the reference's dormant `sliding_window_inference` hook
    (/root/reference/code/GAN/minipig_inference.py:110-114) made real.
    ROI dims must be divisible by the generator's stride product (8).
    """
    trainer, state = load_trainer_state(ckpt_path, cfg)
    cfg = cfg or load_config(Path(ckpt_path))
    out_dir = Path(out_dir or Path(cfg.log_dir) / "minipig")
    out_dir.mkdir(parents=True, exist_ok=True)

    vol, meta = read_nifti(t1_path)
    grid = minipig_native_grid(vol.shape, meta, tuple(cfg.data.spatial_size))
    res = resample_numpy(vol, meta, grid)
    norm = percentile_normalize_numpy(
        res, cfg.data.lower_percentile, cfg.data.upper_percentile,
        cfg.data.b_min, cfg.data.b_max,
    )
    # BN-folded serving forward (models/fold.py), stats-threading fallback
    try:
        predictor = trainer.make_fast_generator(state)
    except Exception:  # pragma: no cover — non-foldable variant
        predictor = jax.jit(lambda x: trainer.generate(state, x))
    if sliding_window is not None:
        from ..ops.sliding_window import sliding_window_inference

        gen = np.asarray(jax.device_get(sliding_window_inference(
            jnp.asarray(norm[..., None]), tuple(sliding_window), predictor,
            sw_batch_size=1, overlap=sw_overlap, mode="gaussian",
        )))[..., 0]
    else:
        t1 = jnp.asarray(norm[None, ..., None])
        gen = np.asarray(jax.device_get(predictor(t1)))[0, ..., 0]

    name = Path(t1_path).name
    base = name.split(".")[0]
    ext = ".".join(name.split(".")[-2:]) if name.endswith(".gz") else name.split(".")[-1]
    out_path = out_dir / f"{base}_inf.{ext}"
    write_nifti(out_path, gen.astype(np.float32), grid.meta())
    print(f"minipig T2 written to {out_path}")
    return str(out_path)
