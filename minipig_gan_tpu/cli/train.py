"""Training CLI — the `python code/GAN/GAN.py` entry the reference README
promises (README.md:11; canonical trainer GAN_final.py:440-499).

Examples:
  python -m minipig_gan_tpu.cli.train --data /path/structure.json \
      --log-dir runs/exp1
  python -m minipig_gan_tpu.cli.train --synthetic --steps 50 \
      --set generator.n_unet_blocks=2 --set train.batch_size=2
"""

from __future__ import annotations

import argparse

from .common import add_config_args, build_config, setup_jax_cache


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    add_config_args(parser)
    parser.add_argument("--data", default=None, help="structure.json path")
    parser.add_argument("--log-dir", default=None)
    parser.add_argument("--steps", type=int, default=None, help="max train steps")
    parser.add_argument("--mode", default=None,
                        choices=["gan", "generator_only", "patch"],
                        help="training mode (config 1/2/3 in SURVEY.md §7)")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the synthetic fixture dataset")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--retries", type=int, default=0,
                        help="auto-restart training from the last checkpoint "
                             "up to N times on failure (elastic recovery)")
    parser.add_argument("--profile", action="store_true",
                        help="wrap the run in a jax profiler trace written to "
                             "{log_dir}/profile (TensorBoard/Perfetto); use "
                             "with a small --steps")
    args = parser.parse_args(argv)

    # config-only setup first (MINIPIG_PLATFORM + compile cache — sets
    # jax.config values, initializes no backend), THEN multi-host bring-up
    # (no-op unless the env requests it) before any jax backend use
    setup_jax_cache()
    from ..parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    cfg = build_config(
        args,
        **{
            "data.structure_json": "" if args.synthetic else args.data,
            "log_dir": args.log_dir,
            "train.max_steps": args.steps,
            "train.mode": args.mode,
        },
    )
    from ..train.loop import train
    from ..utils.env import print_env_config

    # env + resolved-config banner, the reference's print_config() analogue
    # (GAN_final.py:441)
    print_env_config(cfg)

    import contextlib

    if args.profile:
        from ..utils.profiling import trace

        profile_ctx = lambda: trace(str(cfg.log_dir) + "/profile")  # noqa: E731
    else:
        profile_ctx = contextlib.nullcontext

    attempts = args.retries + 1
    for attempt in range(attempts):
        try:
            with profile_ctx():
                train(cfg, resume=(not args.no_resume) or attempt > 0)
            return
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — elastic restart boundary
            if attempt + 1 >= attempts:
                raise
            print(f"training attempt {attempt + 1} failed ({e!r}); "
                  f"restarting from last checkpoint "
                  f"({attempts - attempt - 1} retries left)")


if __name__ == "__main__":
    main()
