"""End-to-end quality demo on synthetic data.

Trains the canonical GAN (6-block CasNet + global discriminator) on the
synthetic phantom dataset at a reduced resolution, then runs the full
evaluation pipeline — the same quality oracles as the reference
(MAE/MSE/PSNR/SSIM/MI vs the T1 identity baseline, BASELINE.md) — and writes
a compact results summary.

Usage:  python examples/synthetic_demo.py [--steps 300] [--spatial 64]
        [--out runs/synthetic_demo]

Path note: put the PACKAGE dir (not the repo root) on PYTHONPATH and keep
any existing entries — the repo root's `code/` (reference-parity entry)
shadows stdlib `code`, and dropping the inherited PYTHONPATH loses the TPU
PJRT plugin:  mkdir -p /tmp/pypath && ln -s $PWD/minipig_gan_tpu /tmp/pypath/
              PYTHONPATH=/tmp/pypath:$PYTHONPATH python examples/...
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--spatial", type=int, default=64)
    p.add_argument("--subjects", type=int, default=24)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--out", default="runs/synthetic_demo")
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--mode", default="gan",
                   choices=["gan", "generator_only", "patch"],
                   help="training mode (patch = config-3 patch+perceptual)")
    p.add_argument("--g-lr", type=float, default=None,
                   help="generator lr override (fixture tuning)")
    p.add_argument("--monitor-every", type=int, default=1,
                   help="loss-monitor cadence (1 = Lightning parity; raise "
                        "on tunneled devices where each improvement save "
                        "fetches the full state)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from minipig_gan_tpu.config import (
        Config, DataConfig, GeneratorConfig, TrainConfig,
    )
    from minipig_gan_tpu.eval.inference import run_inference
    from minipig_gan_tpu.train.loop import train

    out = Path(args.out)
    sp = args.spatial
    cfg = Config(
        generator=GeneratorConfig(n_unet_blocks=args.blocks),
        train=TrainConfig(
            mode=args.mode,
            batch_size=args.batch,
            accum_steps=2 if sp >= 128 else 1,
            max_steps=args.steps,
            compute_dtype="bfloat16",
            log_every=20,
            checkpoint_every=100,
            monitor_every=args.monitor_every,
            image_log_every_epochs=0,
            **({"g_lr": args.g_lr} if args.g_lr else {}),
        ),
        data=DataConfig(
            spatial_size=(sp, sp, sp),
            synthetic_num_pairs=args.subjects,
            cache_num=args.subjects * 2,
            num_workers=8,
        ),
        log_dir=str(out),
    )
    t0 = time.time()
    state, ckpts = train(cfg, resume=False)
    train_s = time.time() - t0

    result = run_inference(
        str(out / "checkpoints" / "last"),
        structure_json=str(out / "synthetic_data" / "structure.json"),
        out_dir=str(out / "inference"),
        save_volumes=True,
    )
    agg = result["aggregate"]
    summary = {
        "mode": args.mode,
        "steps": args.steps,
        "spatial": sp,
        "train_wall_s": round(train_s, 1),
        "mae_gen": agg.get("mae_t2gen_vs_t2gt"),
        "mae_identity": agg.get("mae_t1gt_vs_t2gt"),
        "mae_ratio_pct": agg.get("mae_ratio_pct"),
        "mse_ratio_pct": agg.get("mse_ratio_pct"),
        "psnr_gen": agg.get("psnr_t2gen_vs_t2gt"),
        "psnr_identity": agg.get("psnr_t1gt_vs_t2gt"),
        "ssim_gen": agg.get("ssim_t2gen_vs_t2gt"),
        "ssim_identity": agg.get("ssim_t1gt_vs_t2gt"),
        "mi_gen": agg.get("mi_t2gen_vs_t2gt"),
        "mi_identity": agg.get("mi_t1gt_vs_t2gt"),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
