"""Environment/config banner printed at training start.

The reference opens its training run with MONAI's ``print_config()`` env dump
(/root/reference/code/GAN/GAN_final.py:441) — versions of every dependency
plus system info — so a run's provenance is in its log. This is the
TPU-native equivalent: JAX/XLA versions, the device fleet (platform, chip
kind, counts), compilation-cache status, and the resolved run config.
"""

from __future__ import annotations

import os
import platform
import sys
from typing import Optional


def print_env_config(cfg=None, file=None) -> None:
    """Dump library versions, device fleet, and the resolved config."""
    out = file or sys.stdout

    def p(line: str = "") -> None:
        print(line, file=out)

    p("=== minipig_gan_tpu environment ===")
    p(f"python: {sys.version.split()[0]} ({platform.platform()})")
    try:
        import jax

        p(f"jax: {jax.__version__}")
        try:
            import jaxlib

            p(f"jaxlib: {jaxlib.__version__}")
        except Exception:
            pass
        devs = jax.devices()
        kinds: dict = {}
        for d in devs:
            kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
        fleet = ", ".join(f"{n}x {k}" for k, n in kinds.items())
        p(f"devices: {len(devs)} ({fleet}); default backend: "
          f"{jax.default_backend()}")
        p(f"process: {jax.process_index()}/{jax.process_count()}")
    except Exception as e:  # pragma: no cover — jax init failure
        p(f"jax: unavailable ({e!r})")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib

            m = importlib.import_module(mod)
            p(f"{mod}: {getattr(m, '__version__', '?')}")
        except Exception:
            p(f"{mod}: not installed")
    try:
        from ..data import native

        p(f"native C++ runtime: "
          f"{'loaded' if native.native_available() else 'unavailable'}")
    except Exception:
        p("native C++ runtime: unavailable")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if xla_flags:
        p(f"XLA_FLAGS: {xla_flags}")
    if cfg is not None:
        from ..config import to_json

        p("--- resolved config ---")
        p(to_json(cfg))
    p("=" * 35)
