"""Sliding-window inference: identity predictor reconstructs the volume,
window math covers edges, gaussian blend normalizes to 1."""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)

from minipig_gan_tpu.ops.sliding_window import (
    gaussian_importance,
    sliding_window_inference,
    window_starts,
)


def test_window_starts_cover_and_clamp():
    s = window_starts(20, 8, 0.25)
    assert s[0] == 0 and s[-1] == 12  # flush with edge
    assert all(0 <= x <= 12 for x in s)
    assert np.array_equal(window_starts(8, 8, 0.5), [0])  # roi == dim
    assert np.array_equal(window_starts(6, 8, 0.5), [0])  # roi > dim clamps


def test_identity_predictor_reconstructs():
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.rand(20, 18, 16, 1).astype(np.float32))
    out = sliding_window_inference(vol, (8, 8, 8), lambda x: x,
                                   sw_batch_size=3, overlap=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_identity_gaussian_blend():
    rs = np.random.RandomState(1)
    vol = jnp.asarray(rs.rand(16, 16, 16, 1).astype(np.float32))
    out = sliding_window_inference(vol, (8, 8, 8), lambda x: x,
                                   sw_batch_size=4, overlap=0.5,
                                   mode="gaussian")
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-4)


def test_channel_expanding_predictor():
    vol = jnp.ones((12, 12, 12, 1), jnp.float32)
    out = sliding_window_inference(
        vol, (8, 8, 8), lambda x: jnp.concatenate([x, 2 * x], -1),
        sw_batch_size=2)
    assert out.shape == (12, 12, 12, 2)
    np.testing.assert_allclose(np.asarray(out[..., 1]), 2.0, atol=1e-5)


def test_jit_compatible():
    vol = jnp.ones((12, 12, 12, 1), jnp.float32)
    f = jax.jit(lambda v: sliding_window_inference(v, (8, 8, 8), lambda x: x * 3,
                                                   sw_batch_size=2))
    np.testing.assert_allclose(np.asarray(f(vol)), 3.0, atol=1e-5)


def test_gaussian_importance_properties():
    w = gaussian_importance((8, 8, 8))
    assert w.max() == 1.0 and w.min() > 0
    assert w[4, 4, 4] > w[0, 0, 0]
