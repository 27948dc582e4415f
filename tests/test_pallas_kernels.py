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
