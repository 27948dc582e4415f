"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipig_gan_tpu.ops.pallas.patches_kernel import extract_patches_pallas
from minipig_gan_tpu.ops.pallas.resample_kernel import separable_resample_pallas
from minipig_gan_tpu.ops.patches import extract_patches, sample_patch_corners
from minipig_gan_tpu.ops.resample import _axis_weights, separable_resample


def test_patch_kernel_matches_xla():
    rs = np.random.RandomState(0)
    vols = jnp.asarray(rs.rand(2, 24, 24, 24, 1).astype(np.float32))
    corners = sample_patch_corners(jax.random.PRNGKey(1), 2, (24, 24, 24),
                                   (8, 8, 8), 5)
    expected = extract_patches(vols, corners, (8, 8, 8))
    got = extract_patches_pallas(vols, corners, (8, 8, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_patch_kernel_multichannel():
    rs = np.random.RandomState(1)
    vols = jnp.asarray(rs.rand(1, 16, 16, 16, 2).astype(np.float32))
    corners = jnp.asarray([[[0, 0, 0], [8, 8, 8]]], jnp.int32)
    expected = extract_patches(vols, corners, (8, 8, 8))
    got = extract_patches_pallas(vols, corners, (8, 8, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


@pytest.mark.parametrize("zo,zi,scale,off", [
    (16, 32, 2.0, 0.0),     # downsample 2x
    (32, 16, 0.5, 0.0),     # upsample 2x
    (24, 20, 20 / 24, -0.3),  # non-integer + offset
])
def test_resample_kernel_matches_xla(zo, zi, scale, off):
    rs = np.random.RandomState(2)
    vol = rs.rand(zi, 20, 24).astype(np.float32)
    wz = _axis_weights(zo, zi, scale, off)
    wy = _axis_weights(18, 20, 20 / 18, 0.1)
    wx = _axis_weights(28, 24, 24 / 28, -0.05)
    expected = separable_resample(jnp.asarray(vol),
                                  (jnp.asarray(wz), jnp.asarray(wy), jnp.asarray(wx)))
    got = separable_resample_pallas(jnp.asarray(vol), (wz, wy, wx), tz=8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4)


def test_resample_kernel_ragged_tiles():
    """Zo not a multiple of the z-tile."""
    rs = np.random.RandomState(3)
    vol = rs.rand(12, 8, 8).astype(np.float32)
    wz = _axis_weights(10, 12, 1.2, 0.0)
    wy = _axis_weights(8, 8, 1.0, 0.0)
    wx = _axis_weights(8, 8, 1.0, 0.0)
    expected = separable_resample(jnp.asarray(vol),
                                  (jnp.asarray(wz), jnp.asarray(wy), jnp.asarray(wx)))
    got = separable_resample_pallas(jnp.asarray(vol), (wz, wy, wx), tz=4,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_extract_patches_fast_grad_matches_xla():
    """extract_patches_fast (pallas fwd + scatter-add bwd custom_vjp) must
    produce the same value AND gradient as the XLA gather formulation."""
    from minipig_gan_tpu.ops.patches import extract_patches_fast

    rs = np.random.RandomState(4)
    vols = jnp.asarray(rs.rand(2, 24, 24, 24, 1).astype(np.float32))
    corners = sample_patch_corners(jax.random.PRNGKey(2), 2, (24, 24, 24),
                                   (8, 8, 8), 6)

    def loss_fast(v):
        p = extract_patches_fast(v, corners, (8, 8, 8))
        return jnp.sum(p ** 2)

    def loss_xla(v):
        p = extract_patches(v, corners, (8, 8, 8))
        return jnp.sum(p ** 2)

    v_fast, g_fast = jax.value_and_grad(loss_fast)(vols)
    v_xla, g_xla = jax.value_and_grad(loss_xla)(vols)
    np.testing.assert_allclose(float(v_fast), float(v_xla), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_xla),
                               atol=1e-5)


def test_device_preprocess_matches_host():
    """DataConfig.device_preprocess routes resample+normalize on-device
    (config 4); results must match the host numpy pipeline."""
    from minipig_gan_tpu.config import DataConfig
    from minipig_gan_tpu.data.pipeline import PairPreprocessor
    from minipig_gan_tpu.data.synthetic import synthetic_pair
    from minipig_gan_tpu.data.nifti import write_nifti
    import tempfile
    from pathlib import Path

    t1, t2, meta = synthetic_pair(shape_zyx=(20, 22, 24), seed=5)
    with tempfile.TemporaryDirectory() as d:
        p1 = Path(d) / "t1.nii.gz"
        p2 = Path(d) / "t2.nii.gz"
        write_nifti(p1, t1, meta)
        write_nifti(p2, t2, meta)
        cfg = DataConfig(spatial_size=(16, 16, 16))
        pair = {"t1w": str(p1), "t2w": str(p2)}
        host = PairPreprocessor(cfg, use_native=False, device=False)(pair)
        dev = PairPreprocessor(cfg, use_native=False, device=True)(pair)
    for k in ("t1w", "t2w"):
        assert dev[k].shape == host[k].shape == (16, 16, 16, 1)
        np.testing.assert_allclose(dev[k], host[k], atol=2e-3)


@pytest.mark.skipif("MINIPIG_TPU_TESTS" not in __import__("os").environ,
                    reason="real-TPU kernel parity (set MINIPIG_TPU_TESTS=1)")
def test_pallas_compiled_on_tpu():
    """Non-interpret parity on the real chip, in a clean subprocess (this
    test process is pinned to the CPU backend by conftest)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = f"{repo}:" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(repo / "tpu_tests" / "pallas_parity.py")],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    print(proc.stdout, proc.stderr)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_wgrad_ci1_flat_matches_autodiff():
    """The hybrid XLA-im2col + Pallas streaming-dot Ci=1 wgrad
    (ops/pallas/wgrad_flat.py): grad-exactness vs jax's own wgrad in
    interpret mode, for the CasNet in-conv geometries it targets."""
    from jax import lax

    from minipig_gan_tpu.ops.pallas.wgrad_flat import (
        conv3d_wgrad_ci1_flat, conv3d_wgrad_ci1_supported,
    )

    rs = np.random.RandomState(7)
    for co, k, p, dim in ((16, 3, 1, 12), (4, 3, 1, 10), (8, 2, 0, 9)):
        x = jnp.asarray(rs.randn(2, dim, dim, dim, 1), jnp.float32)
        w = jnp.asarray(rs.randn(k, k, k, 1, co) * 0.3, jnp.float32)
        pads = ((p, p),) * 3
        assert conv3d_wgrad_ci1_supported(x.shape, (k, k, k), (1, 1, 1))

        def loss(w_):
            y = lax.conv_general_dilated(
                x, w_, (1, 1, 1), pads,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return jnp.sum(y * y)

        ref = jax.grad(loss)(w)
        y = lax.conv_general_dilated(
            x, w, (1, 1, 1), pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        got = conv3d_wgrad_ci1_flat(x, 2 * y, (k, k, k), (1, 1, 1), pads,
                                    interpret=True)
        scale = float(np.max(np.abs(np.asarray(ref)))) or 1.0
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(ref) / scale,
                                   rtol=3e-6, atol=3e-6)
