"""Parity of the Pallas single-pass tap-reduce wgrad (interpret mode on CPU)
against the XLA im2col route and jax's own autodiff, over the ci==1 stride-1
geometries the CasNet uses (reference conv set GAN_final.py:92-122)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from minipig_gan_tpu.ops import fastconv
from minipig_gan_tpu.ops.pallas.tap_reduce_kernel import tap_reduce_wgrad_pallas

CASES = [
    # (spatial, co, dtype) — SAME stride-1, k=3 (the concatenate.177 class)
    ((16, 16, 16), 1, jnp.float32),    # the 1->1 up_ru unit0 conv
    ((16, 16, 16), 16, jnp.float32),   # 1->16 in-conv shape class
    ((8, 16, 16), 3, jnp.float32),     # anisotropic D
    ((16, 16, 16), 1, jnp.bfloat16),   # the canonical step's compute dtype
]


@pytest.mark.parametrize("spatial,co,dtype", CASES)
def test_tap_reduce_matches_autodiff(spatial, co, dtype):
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, *spatial, 1), dtype)
    w0 = jnp.zeros((3, 3, 3, 1, co), jnp.float32)
    dy = jnp.asarray(rs.randn(2, *spatial, co), dtype)

    def f(w):
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), w, window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y * dy.astype(jnp.float32))

    ref = jax.grad(f)(w0)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    got = tap_reduce_wgrad_pallas(xp[..., 0], dy, 3, interpret=True)
    got = got.reshape(3, 3, 3, 1, co)
    scale = float(np.max(np.abs(np.asarray(ref)))) or 1.0
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-6
    np.testing.assert_allclose(np.asarray(got, np.float32) / scale,
                               np.asarray(ref) / scale,
                               rtol=tol, atol=tol)


def test_tap_reduce_matches_im2col_route():
    """Bit-level sibling check against the default XLA formulation."""
    rs = np.random.RandomState(12)
    x = jnp.asarray(rs.randn(2, 8, 16, 16, 1), jnp.float32)
    dy = jnp.asarray(rs.randn(2, 8, 16, 16, 4), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    ref = fastconv._wgrad_im2col_ci1(xp, dy, (3, 3, 3), (1, 1, 1))
    got = tap_reduce_wgrad_pallas(xp[..., 0], dy, 3, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.reshape(3, 3, 3, 1, 4)), np.asarray(ref),
        rtol=1e-4, atol=1e-4)


def test_tile_shrinks_for_wide_channels():
    """The VMEM guard halves tile_d until the b block fits; result unchanged."""
    rs = np.random.RandomState(13)
    x = jnp.asarray(rs.randn(1, 8, 8, 8, 1), jnp.float32)
    dy = jnp.asarray(rs.randn(1, 8, 8, 8, 8), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    a = tap_reduce_wgrad_pallas(xp[..., 0], dy, 3, tile_d=8, interpret=True)
    b = tap_reduce_wgrad_pallas(xp[..., 0], dy, 3, tile_d=2, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_flag_routes_only_on_tpu():
    """With set_ci1_pallas(True) on CPU the XLA route is still taken
    (backend gate) — grads stay exact."""
    rs = np.random.RandomState(14)
    x = jnp.asarray(rs.randn(2, 8, 8, 8, 1), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 1, 1) * 0.2, jnp.float32)
    cot = jnp.asarray(rs.randn(2, 8, 8, 8, 1), jnp.float32)

    def loss(w):
        return jnp.sum(fastconv.conv3d_op(
            x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1))) * cot)

    ref = jax.grad(loss)(w)
    fastconv.set_ci1_pallas(True)
    try:
        got = jax.grad(loss)(w)
    finally:
        fastconv.set_ci1_pallas(False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
