"""Resampler: grid-policy formulas (transforms.py:140-147, transforms2.py:
148-165), interpolation correctness vs a numpy oracle, separable==gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipig_gan_tpu.data.nifti import ImageMeta
from minipig_gan_tpu.ops.resample import (
    GridSpec,
    _axis_weights,
    human_canonical_grid,
    minipig_native_grid,
    resample,
    resample_affine,
    separable_resample,
    trilinear_gather,
)


def numpy_trilinear(vol, m, t, out_zyx):
    """Straightforward oracle: loop-free numpy trilinear with zero padding."""
    zo, yo, xo = out_zyx
    zi, yi, xi = np.meshgrid(np.arange(zo), np.arange(yo), np.arange(xo),
                             indexing="ij")
    cx = m[0, 0] * xi + m[0, 1] * yi + m[0, 2] * zi + t[0]
    cy = m[1, 0] * xi + m[1, 1] * yi + m[1, 2] * zi + t[1]
    cz = m[2, 0] * xi + m[2, 1] * yi + m[2, 2] * zi + t[2]
    nz, ny, nx = vol.shape
    inside = ((cx >= 0) & (cx <= nx - 1) & (cy >= 0) & (cy <= ny - 1)
              & (cz >= 0) & (cz <= nz - 1))
    x0 = np.clip(np.floor(cx), 0, nx - 1).astype(int)
    y0 = np.clip(np.floor(cy), 0, ny - 1).astype(int)
    z0 = np.clip(np.floor(cz), 0, nz - 1).astype(int)
    fx, fy, fz = cx - x0, cy - y0, cz - z0
    x1 = np.minimum(x0 + 1, nx - 1)
    y1 = np.minimum(y0 + 1, ny - 1)
    z1 = np.minimum(z0 + 1, nz - 1)
    g = lambda zz, yy, xx: vol[zz, yy, xx]
    out = (
        (g(z0, y0, x0) * (1 - fx) + g(z0, y0, x1) * fx) * (1 - fy)
        + (g(z0, y1, x0) * (1 - fx) + g(z0, y1, x1) * fx) * fy
    ) * (1 - fz) + (
        (g(z1, y0, x0) * (1 - fx) + g(z1, y0, x1) * fx) * (1 - fy)
        + (g(z1, y1, x0) * (1 - fx) + g(z1, y1, x1) * fx) * fy
    ) * fz
    return np.where(inside, out, 0.0)


def test_human_canonical_grid_formula():
    """128^3 @ 256mm: origin (-64,-64,-64), spacing 2.0 — the eval XML grid
    (code/eval/*.xml: voxelspacing 2.0)."""
    g = human_canonical_grid((128, 128, 128), 256.0)
    np.testing.assert_array_equal(g.origin, [-64, -64, -64])
    np.testing.assert_array_equal(g.spacing, [2, 2, 2])
    np.testing.assert_array_equal(g.direction, np.eye(3))
    assert g.size_zyx == (128, 128, 128)


def test_minipig_grid_formula():
    meta = ImageMeta(origin=np.array([5.0, -3.0, 2.0]),
                     spacing=np.array([0.5, 0.5, 1.0]),
                     direction=np.eye(3))
    shape_zyx = (40, 64, 64)  # xyz = (64, 64, 40)
    g = minipig_native_grid(shape_zyx, meta, (128, 128, 128))
    np.testing.assert_allclose(g.spacing, [64 * 0.5 / 128, 64 * 0.5 / 128,
                                           40 * 1.0 / 128])
    np.testing.assert_allclose(
        g.origin, meta.origin - meta.spacing / 2 + g.spacing / 2)
    np.testing.assert_array_equal(g.direction, np.eye(3))


def test_identity_resample_preserves_volume():
    """Same grid as the input -> identity (up to fp)."""
    rs = np.random.RandomState(0)
    vol = rs.rand(8, 10, 12).astype(np.float32)
    meta = ImageMeta(origin=np.array([-6.0, -5.0, -4.0]), spacing=np.ones(3),
                     direction=np.eye(3))
    grid = GridSpec(size_zyx=vol.shape, origin=meta.origin, spacing=meta.spacing,
                    direction=np.eye(3))
    out = np.asarray(resample(vol, meta, grid))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_gather_matches_numpy_oracle_rotated():
    rs = np.random.RandomState(1)
    vol = rs.rand(10, 12, 14).astype(np.float32)
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    meta = ImageMeta(
        origin=np.array([-7.0, -6.0, -5.0]),
        spacing=np.array([1.3, 0.9, 1.1]),
        direction=np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]),
    )
    grid = human_canonical_grid((16, 16, 16), fov_mm=20.0)
    m, t = resample_affine(meta, grid)
    expected = numpy_trilinear(vol, m, t, grid.size_zyx)
    got = np.asarray(trilinear_gather(jnp.asarray(vol), jnp.asarray(m),
                                      jnp.asarray(t), grid.size_zyx))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_separable_matches_gather_axis_aligned():
    rs = np.random.RandomState(2)
    vol = rs.rand(12, 16, 20).astype(np.float32)
    meta = ImageMeta(origin=np.array([-10.0, -8.0, -6.0]),
                     spacing=np.array([1.0, 1.25, 0.8]),
                     direction=np.eye(3))
    grid = minipig_native_grid(vol.shape, meta, (24, 24, 24))
    m, t = resample_affine(meta, grid)
    assert np.allclose(m, np.diag(np.diag(m)))  # policy is axis-aligned
    via_gather = np.asarray(trilinear_gather(
        jnp.asarray(vol), jnp.asarray(m), jnp.asarray(t), grid.size_zyx))
    via_auto = np.asarray(resample(vol, meta, grid))  # picks separable path
    np.testing.assert_allclose(via_auto, via_gather, atol=1e-4)


def test_axis_weights_zero_outside():
    w = _axis_weights(8, 4, 2.0, 0.0)  # out idx 2.. map past the input end
    # rows sampling inside [0, 3] have weight sum 1, others 0
    sums = w.sum(axis=1)
    np.testing.assert_allclose(sums[:2], 1.0, atol=1e-6)
    np.testing.assert_allclose(sums[2:], [0.0] * 6, atol=1e-6)


def test_resample_batch_jit():
    """Resample is jittable with static grids (used inside the train input
    pipeline)."""
    vol = np.random.RandomState(3).rand(8, 8, 8).astype(np.float32)
    meta = ImageMeta(origin=-np.ones(3) * 4, spacing=np.ones(3),
                     direction=np.eye(3))
    grid = human_canonical_grid((16, 16, 16), fov_mm=8.0)
    m, t = resample_affine(meta, grid)
    f = jax.jit(lambda v: trilinear_gather(v, jnp.asarray(m), jnp.asarray(t),
                                           grid.size_zyx))
    out = np.asarray(f(jnp.asarray(vol)))
    assert out.shape == (16, 16, 16)
    assert np.isfinite(out).all()
