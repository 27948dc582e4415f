"""Shared CLI plumbing: config file + dotted-path overrides.

The reference has no config/flag system (hard-coded absolute paths,
GAN_final.py:445, inferrence.py:91-92); here every CLI accepts
``--config cfg.json`` and repeated ``--set section.key=value`` overrides.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

from ..config import Config, apply_overrides, from_json


def add_config_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--config", default=None,
                        help="path to a config JSON (defaults applied otherwise)")
    parser.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                        help="dotted-path override, e.g. --set train.g_lr=1e-3")


def build_config(args: argparse.Namespace, **direct_overrides) -> Config:
    if args.config:
        cfg = from_json(Path(args.config).read_text())
    else:
        cfg = Config()
    overrides = {}
    for kv in args.set:
        if "=" not in kv:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        overrides[k] = v
    for k, v in direct_overrides.items():
        if v is not None:
            overrides[k] = str(v)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def setup_jax_cache() -> None:
    """Persistent XLA compile cache — first compiles on the remote-compile TPU
    path are expensive; this makes them one-time per program.

    Also honors MINIPIG_PLATFORM=cpu|tpu|axon: this container's sitecustomize
    registers the axon TPU plugin in every interpreter, so the standard
    JAX_PLATFORMS env var is not reliably honored — the platform must be
    forced through jax.config before backends initialize (the same trick as
    tests/conftest.py). Lets every CLI run on CPU when the TPU tunnel is
    down or absent."""
    import os

    import jax

    if os.environ.get("MINIPIG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MINIPIG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
