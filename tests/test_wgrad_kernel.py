"""Correctness of the Pallas conv3d wgrad kernel (interpret mode) and its
XLA fallback against the autodiff-derived ground truth.

Reference semantics being matched: the weight gradient of every Conv3d in
/root/reference/code/GAN/GAN_final.py:92-209 (there computed by cuDNN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipig_gan_tpu.ops.pallas.wgrad_kernel import (
    conv3d_wgrad_pallas,
    conv3d_wgrad_reference,
    conv3d_wgrad_supported,
    conv3d_wgrad_xla,
)

CASES = [
    # (spatial, ci, co, k, s, p)   — tiny stand-ins for the step's shapes
    ((10, 10, 10), 8, 8, 3, 1, 1),   # CasNet-like SAME conv
    ((10, 10, 10), 8, 8, 3, 1, 0),   # VALID stride-1 (D blocks 0/1 shape-wise)
    ((12, 12, 12), 8, 8, 4, 2, 0),   # D blocks 2/3 (k4 s2 VALID)
    ((12, 12, 12), 8, 16, 3, 2, 1),  # UNet down conv (k3 s2 SAME)
    ((9, 11, 13), 8, 8, 3, 1, 1),    # odd, anisotropic extents
    ((11, 9, 12), 8, 8, 4, 2, 0),    # odd extents, strided
]


def _make(spatial, ci, co, k, s, p, dtype=jnp.float32):
    rs = np.random.RandomState(0)
    d, h, w = spatial
    o = [(e + 2 * p - k) // s + 1 for e in spatial]
    x = jnp.asarray(rs.randn(2, d, h, w, ci), dtype)
    dy = jnp.asarray(rs.randn(2, *o, co), dtype)
    return x, dy


@pytest.mark.parametrize("spatial,ci,co,k,s,p", CASES)
def test_xla_fallback_matches_autodiff(spatial, ci, co, k, s, p):
    x, dy = _make(spatial, ci, co, k, s, p)
    ref = conv3d_wgrad_reference(x, dy, (k,) * 3, (s,) * 3, (p,) * 3)
    got = conv3d_wgrad_xla(x, dy, (k,) * 3, (s,) * 3, (p,) * 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("spatial,ci,co,k,s,p", CASES)
def test_pallas_wgrad_matches_autodiff(spatial, ci, co, k, s, p):
    x, dy = _make(spatial, ci, co, k, s, p)
    assert conv3d_wgrad_supported(
        x.shape, dy.shape, (k,) * 3, (s,) * 3, (p,) * 3)
    ref = conv3d_wgrad_reference(x, dy, (k,) * 3, (s,) * 3, (p,) * 3)
    got = conv3d_wgrad_pallas(
        x, dy, (k,) * 3, (s,) * 3, (p,) * 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_unsupported_shapes_rejected():
    # tiny channel counts (the 1<->16ch CasNet convs) fall back to XLA
    assert not conv3d_wgrad_supported(
        (2, 8, 8, 8, 1), (2, 8, 8, 8, 16), (3, 3, 3), (1, 1, 1), (1, 1, 1))
    # stride 3 unsupported
    assert not conv3d_wgrad_supported(
        (2, 9, 9, 9, 8), (2, 3, 3, 3, 8), (3, 3, 3), (3, 3, 3), (0, 0, 0))
    # inconsistent geometry
    assert not conv3d_wgrad_supported(
        (2, 8, 8, 8, 8), (2, 8, 8, 8, 8), (3, 3, 3), (1, 1, 1), (0, 0, 0))
