"""Replay the JAX models against the checked-in golden fixtures.

The goldens (tests/goldens/*.npz) are TORCH-mirror outputs recorded by
tests/make_goldens.py for deterministic PRNGKey-initialized weights; this
test re-initializes the same models from the same seeds and compares —
torch-free, fast, and stable offline. See docs/AUDIT_MONAI_040.md for what
the mirror itself was audited against (and the shared-bug risk statement).
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)

from minipig_gan_tpu.models import (
    GlobalDiscriminator,
    MonaiDiscriminator,
    PatchPerceptualDiscriminator,
    UNet3D,
)

GOLD = pathlib.Path(__file__).parent / "goldens"


def _load(name):
    p = GOLD / f"{name}.npz"
    if not p.exists():
        pytest.skip(f"golden {p} missing — run tests/make_goldens.py")
    return np.load(p)


def test_unet3d_matches_golden():
    g = _load("unet3d_16cube")
    m = UNet3D(out_channels=1, channels=(16, 32, 64, 128), strides=(2, 2, 2),
               num_res_units=2)
    variables = m.init(jax.random.PRNGKey(int(g["seed"])),
                       jnp.asarray(g["x"]), train=True)
    y_train, upd = m.apply(variables, jnp.asarray(g["x"]), train=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_train), g["y_train"],
                               rtol=5e-4, atol=5e-4)
    # the golden eval output was recorded AFTER the train-mode forward, so
    # torch's running stats had one momentum-0.1 update — replay that by
    # threading the updated batch_stats (this also pins the EMA update rule)
    y_eval = m.apply({"params": variables["params"],
                      "batch_stats": upd["batch_stats"]},
                     jnp.asarray(g["x"]), train=False)
    np.testing.assert_allclose(np.asarray(y_eval), g["y_eval"],
                               rtol=5e-4, atol=5e-4)


def test_global_discriminator_matches_golden():
    g = _load("global_d_32cube")
    m = GlobalDiscriminator(features=tuple(int(f) for f in g["features"]))
    variables = m.init(jax.random.PRNGKey(int(g["seed"])),
                       jnp.asarray(g["x"]), train=True)
    logits, _ = m.apply(variables, jnp.asarray(g["x"]), train=True,
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(logits), g["logits"],
                               rtol=5e-4, atol=5e-4)


def test_patch_discriminator_matches_golden():
    g = _load("patch_d_16cube")
    m = PatchPerceptualDiscriminator(features=(4, 8, 8, 8), hidden=4,
                                     capture_activations=True)
    variables = m.init(jax.random.PRNGKey(int(g["seed"])),
                       jnp.asarray(g["x"]), train=True)
    (logits, acts), _ = m.apply(variables, jnp.asarray(g["x"]), train=True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(logits), g["logits"],
                               rtol=5e-4, atol=5e-4)
    assert len(acts) == int(g["n_acts"])
    for i, a in enumerate(acts):
        np.testing.assert_allclose(np.asarray(a), g[f"act{i}"],
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"activation tap {i}")


def test_monai_discriminator_matches_golden():
    g = _load("monai_d_32cube")
    m = MonaiDiscriminator()
    variables = m.init(jax.random.PRNGKey(int(g["seed"])),
                       jnp.asarray(g["x"]), train=False)
    logits = m.apply(variables, jnp.asarray(g["x"]), train=False)
    np.testing.assert_allclose(np.asarray(logits), g["logits"],
                               rtol=5e-4, atol=5e-4)
