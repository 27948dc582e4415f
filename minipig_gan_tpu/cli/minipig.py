"""Minipig transfer inference CLI (minipig_inference.py replacement):
human-trained weights + minipig native-FOV preprocessing grid."""

from __future__ import annotations

import argparse

from .common import add_config_args, build_config, setup_jax_cache


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--t1", required=True, help="minipig T1w NIfTI path")
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--sliding-window", default=None, metavar="D,H,W",
                        help="run the generator over overlapping ROI windows "
                             "of this size with gaussian blending (the "
                             "reference's dormant hook, "
                             "minipig_inference.py:110-114); dims must be "
                             "multiples of 8")
    parser.add_argument("--sw-overlap", type=float, default=0.25)
    args = parser.parse_args(argv)

    setup_jax_cache()
    cfg = build_config(args) if (args.config or args.set) else None
    from ..eval.minipig import run_minipig_inference

    roi = (tuple(int(v) for v in args.sliding_window.split(","))
           if args.sliding_window else None)
    run_minipig_inference(args.ckpt, args.t1, out_dir=args.out_dir, cfg=cfg,
                          sliding_window=roi, sw_overlap=args.sw_overlap)


if __name__ == "__main__":
    main()
