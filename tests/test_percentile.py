"""Percentile windowing vs the numpy/MONAI formula (GAN_final.py:386-394)."""

import numpy as np

import jax.numpy as jnp

from minipig_gan_tpu.ops.percentile import (
    approx_percentile_window,
    percentile_window,
    rescale_to_uint8_range,
    scale_intensity_range_percentiles,
)


def monai_reference(img, lower, upper, b_min, b_max, clip):
    a_min = np.percentile(img, lower)
    a_max = np.percentile(img, upper)
    out = (img - a_min) / (a_max - a_min) * (b_max - b_min) + b_min
    if clip:
        out = np.clip(out, b_min, b_max)
    return out


def test_exact_percentile_matches_numpy():
    rs = np.random.RandomState(0)
    vol = rs.randn(16, 16, 16).astype(np.float32) * 50 + 10
    lo, hi = percentile_window(jnp.asarray(vol), 1.0, 99.0)
    assert abs(float(lo) - np.percentile(vol, 1.0)) < 1e-2
    assert abs(float(hi) - np.percentile(vol, 99.0)) < 1e-2


def test_scale_matches_monai_formula():
    rs = np.random.RandomState(1)
    vol = rs.gamma(2.0, 100.0, (12, 14, 10)).astype(np.float32)
    got = np.asarray(scale_intensity_range_percentiles(
        jnp.asarray(vol), 1.0, 99.0, -1.0, 1.0, True))
    expected = monai_reference(vol, 1.0, 99.0, -1.0, 1.0, True)
    np.testing.assert_allclose(got, expected, atol=2e-4)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_rescale_uint8_range():
    rs = np.random.RandomState(2)
    vol = rs.randn(8, 8, 8).astype(np.float32)
    out = np.asarray(rescale_to_uint8_range(jnp.asarray(vol)))
    assert out.min() == 0.0 and out.max() == 255.0
    assert np.all(out == np.round(out))


def test_approx_percentile_close_to_exact():
    rs = np.random.RandomState(3)
    vol = rs.randn(32, 32, 32).astype(np.float32) * 100
    lo_a, hi_a = approx_percentile_window(jnp.asarray(vol), 1.0, 99.0)
    lo_e, hi_e = np.percentile(vol, 1.0), np.percentile(vol, 99.0)
    rng = vol.max() - vol.min()
    assert abs(float(lo_a) - lo_e) < 0.002 * rng
    assert abs(float(hi_a) - hi_e) < 0.002 * rng
