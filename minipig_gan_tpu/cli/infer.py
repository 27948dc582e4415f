"""Inference + evaluation CLI (inferrence.py / metrics.py /
psnr_ssim_metric.py replacement — one pass, on-device metrics)."""

from __future__ import annotations

import argparse

from .common import add_config_args, build_config, setup_jax_cache


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--ckpt", required=True,
                        help="checkpoint directory, OR a run's checkpoints/ "
                             "dir with --monitor to pick a monitored best")
    parser.add_argument("--monitor", default=None,
                        choices=["g_loss", "g_recon_loss", "d_loss"],
                        help="resolve --ckpt as a checkpoints/ dir and use "
                             "the best checkpoint for this monitor (the "
                             "reference hardcodes its best-g_loss path, "
                             "inferrence.py:102)")
    parser.add_argument("--data", default=None, help="structure.json override")
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--split", default="test",
                        choices=["train", "validation", "test"])
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--no-save", action="store_true",
                        help="metrics only, skip NIfTI outputs")
    parser.add_argument("--bn-recalibrate", type=int, default=0,
                        metavar="K",
                        help="refresh generator BN running stats on K "
                        "train-split batches before evaluating (K~50 "
                        "converges; reference-plus serving option)")
    args = parser.parse_args(argv)

    setup_jax_cache()
    cfg = None
    if args.config or args.set:
        cfg = build_config(args)
    from ..eval.inference import run_inference

    ckpt = args.ckpt
    if args.monitor:
        from ..train.checkpoints import TopKCheckpointManager

        best = TopKCheckpointManager(ckpt).best_for(args.monitor)
        if not best:
            raise SystemExit(
                f"no best checkpoint recorded for {args.monitor} in {ckpt}")
        print(f"using best {args.monitor} checkpoint: {best}")
        ckpt = best

    run_inference(
        ckpt,
        structure_json=args.data,
        out_dir=args.out_dir,
        cfg=cfg,
        limit=args.limit,
        save_volumes=not args.no_save,
        split=args.split,
        bn_recalib_batches=args.bn_recalibrate,
    )


if __name__ == "__main__":
    main()
