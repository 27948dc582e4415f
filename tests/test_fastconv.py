"""conv3d_op (barrier-scheduled gradients) must reproduce jax's autodiff
exactly — same forward, same dx, same dw — for every conv geometry the
models use (GAN_final.py:92-209 conv set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from minipig_gan_tpu.ops import fastconv

CASES = [
    # (spatial, ci, co, k, s, p) — exercises every wgrad route in fastconv:
    ((8, 8, 8), 1, 4, 3, 1, 1),     # ci==1 im2col route (CasNet in-conv)
    ((8, 8, 8), 1, 1, 3, 1, 1),     # ci==co==1 (up_ru unit0 conv)
    ((8, 9, 10), 4, 1, 3, 1, 1),    # co==1 role-swap route (up-path out conv)
    ((10, 10, 10), 1, 4, 3, 2, 1),  # ci==1, strided
    ((8, 9, 10), 3, 5, 3, 1, 0),    # tap-einsum route, VALID anisotropic
    ((12, 12, 12), 4, 6, 4, 2, 0),  # tap-einsum, D stride-2 k4 VALID
    ((12, 11, 12), 3, 4, 3, 2, 1),  # tap-einsum, UNet down conv k3 s2 SAME
    ((9, 9, 9), 4, 1, 3, 2, 1),     # co==1 but strided -> tap-einsum route
]


def _plain(x, w, s, pads):
    return lax.conv_general_dilated(
        x, w, window_strides=s, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("spatial,ci,co,k,s,p", CASES)
def test_conv3d_op_grads_match_autodiff(spatial, ci, co, k, s, p):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, *spatial, ci), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, k, ci, co) * 0.2, jnp.float32)
    strides = (s, s, s)
    pads = [(p, p)] * 3
    o = [(e + 2 * p - k) // s + 1 for e in spatial]
    cot = jnp.asarray(rs.randn(2, *o, co), jnp.float32)

    def loss_plain(x, w):
        return jnp.sum(_plain(x, w, strides, pads) * cot)

    def loss_op(x, w):
        return jnp.sum(
            fastconv.conv3d_op(x, w, strides, tuple(map(tuple, pads))) * cot)

    y0 = _plain(x, w, strides, pads)
    y1 = fastconv.conv3d_op(x, w, strides, tuple(map(tuple, pads)))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    gx0, gw0 = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(loss_op, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                               rtol=1e-5, atol=1e-4)


def test_wgrad_conv_formulation_matches_autodiff():
    """The swapped-conv formulation (default route for multi-channel convs)."""
    rs = np.random.RandomState(2)
    for s, p, k in ((1, 0, 3), (2, 0, 4), (2, 1, 3)):
        x = jnp.asarray(rs.randn(2, 11, 10, 12, 3), jnp.float32)
        o = [(e + 2 * p - k) // s + 1 for e in (11, 10, 12)]
        dy = jnp.asarray(rs.randn(2, *o, 5), jnp.float32)

        def f(w):
            return jnp.sum(_plain(x, w, (s,) * 3, [(p, p)] * 3) * dy)

        ref = jax.grad(f)(jnp.zeros((k, k, k, 3, 5)))
        got = fastconv.conv3d_wgrad(
            x, dy, (k,) * 3, (s,) * 3, ((p, p),) * 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_toggle_controls_layer_path():
    fastconv.set_grad_barrier(False)
    try:
        assert not fastconv.grad_barrier_enabled()
        # disabled path is the plain conv (no custom_vjp in the jaxpr)
        x = jnp.zeros((1, 6, 6, 6, 2))
        w = jnp.zeros((3, 3, 3, 2, 4))
        jaxpr = jax.make_jaxpr(
            lambda x, w: fastconv.conv3d(x, w, (1, 1, 1), [(1, 1)] * 3)
        )(x, w)
        assert "custom_vjp" not in str(jaxpr)
    finally:
        fastconv.set_grad_barrier(True)
    jaxpr = jax.make_jaxpr(
        lambda x, w: fastconv.conv3d(x, w, (1, 1, 1), [(1, 1)] * 3)
    )(x, w)
    assert "custom_vjp" in str(jaxpr)


def test_conv_transpose3d_op_grads_match_autodiff():
    rs = np.random.RandomState(3)
    for (s, p, op_, k) in ((2, 1, 1, 3), (2, 0, 0, 4), (1, 1, 0, 3)):
        x = jnp.asarray(rs.randn(2, 6, 7, 6, 4), jnp.float32)
        kt = jnp.asarray(rs.randn(k, k, k, 4, 3) * 0.2, jnp.float32)
        strides = (s, s, s)
        pads = tuple((k - 1 - p, k - 1 - p + op_) for _ in range(3))

        def plain(x, kt):
            return jax.lax.conv_general_dilated(
                x, kt, window_strides=(1, 1, 1), padding=pads,
                lhs_dilation=strides,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        y0 = plain(x, kt)
        y1 = fastconv.conv_transpose3d_op(x, kt, strides, pads)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        cot = jnp.asarray(rs.randn(*y0.shape), jnp.float32)
        g0 = jax.grad(lambda x, kt: jnp.sum(plain(x, kt) * cot),
                      argnums=(0, 1))(x, kt)
        g1 = jax.grad(
            lambda x, kt: jnp.sum(
                fastconv.conv_transpose3d_op(x, kt, strides, pads) * cot),
            argnums=(0, 1))(x, kt)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_conv3d_layer_grads_unchanged_by_barrier():
    """A Conv3d module's grads agree with the barrier on/off.

    Not bit-identical: the routed wgrad formulations accumulate in f32 with
    a different summation order than XLA's conv transpose rule (they are the
    MORE accurate side — cf. wgrad_bench.py's f64 check)."""
    from minipig_gan_tpu.models.layers import Conv3d

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 8, 3), jnp.float32)
    m = Conv3d(5, kernel_size=3, strides=1, padding=1)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        return jnp.sum(jnp.square(m.apply(params, x)))

    grads = {}
    for flag in (True, False):
        fastconv.set_grad_barrier(flag)
        try:
            grads[flag] = jax.grad(loss)(params, x)
        finally:
            fastconv.set_grad_barrier(True)
    g_on = jax.tree.leaves(grads[True])
    g_off = jax.tree.leaves(grads[False])
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_ci1_taps_major_stack_matches_taps_minor():
    """The taps-major ([k^3, vox]) im2col layout (chip A/B hook
    set_ci1_taps_major) computes the same dw/dkt as the default taps-minor
    layout — same slices, same f32-accumulated dot, only the stack axis and
    contraction dims change. Not bit-identical: the two dot layouts tile the
    vox-sized K contraction differently, so f32 summation order differs
    (~1e-6 relative); a wrong stack would permute taps and be orders of
    magnitude off."""
    rs = np.random.RandomState(7)
    # _wgrad_im2col_ci1: ci==1, both co==1 and co>1, stride 1 and 2
    for co, s in ((1, 1), (16, 2)):
        x = jnp.asarray(rs.randn(2, 10, 10, 10, 1), jnp.float32)
        o = [(10 + 2 - 3) // s + 1 for _ in range(3)]
        dy = jnp.asarray(rs.randn(2, *o, co), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        ref = fastconv._wgrad_im2col_ci1(xp, dy, (3, 3, 3), (s, s, s))
        fastconv.set_ci1_taps_major(True)
        try:
            got = fastconv._wgrad_im2col_ci1(xp, dy, (3, 3, 3), (s, s, s))
        finally:
            fastconv.set_ci1_taps_major(False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    # _wgradT_co1: the transposed-conv sibling
    x = jnp.asarray(rs.randn(2, 6, 7, 6, 8), jnp.float32)
    kt = jnp.asarray(rs.randn(3, 3, 3, 8, 1) * 0.2, jnp.float32)
    pads = ((1, 2), (1, 2), (1, 2))
    y = lax.conv_general_dilated(
        x, kt, window_strides=(1, 1, 1), padding=pads,
        lhs_dilation=(2, 2, 2), dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    cot = jnp.asarray(rs.randn(*y.shape), jnp.float32)
    ref = fastconv._wgradT_co1(x, cot, (3, 3, 3), (2, 2, 2), pads)
    fastconv.set_ci1_taps_major(True)
    try:
        got = fastconv._wgradT_co1(x, cot, (3, 3, 3), (2, 2, 2), pads)
    finally:
        fastconv.set_ci1_taps_major(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose3d_co1_route_matches_autodiff():
    """The 1-output-channel ConvTranspose wgrad route (_wgradT_co1) — every
    CasNet block's top up conv (MONAI UNet out_channels=1). The routed
    patch-matrix dot must match jax's own vjp of the lhs-dilated conv on
    all up-conv geometries, including output_padding."""
    rs = np.random.RandomState(5)
    for (ci, s, p, op_, k) in ((8, 2, 1, 1, 3), (4, 2, 0, 0, 4),
                               (6, 1, 1, 0, 3)):
        x = jnp.asarray(rs.randn(2, 6, 7, 6, ci), jnp.float32)
        kt = jnp.asarray(rs.randn(k, k, k, ci, 1) * 0.2, jnp.float32)
        strides = (s, s, s)
        pads = tuple((k - 1 - p, k - 1 - p + op_) for _ in range(3))

        def plain(x, kt):
            return lax.conv_general_dilated(
                x, kt, window_strides=(1, 1, 1), padding=pads,
                lhs_dilation=strides,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        cot = jnp.asarray(rs.randn(*plain(x, kt).shape), jnp.float32)
        g0 = jax.grad(lambda x, kt: jnp.sum(plain(x, kt) * cot),
                      argnums=(0, 1))(x, kt)
        g1 = jax.grad(
            lambda x, kt: jnp.sum(
                fastconv.conv_transpose3d_op(x, kt, strides, pads) * cot),
            argnums=(0, 1))(x, kt)
        for a, b in zip(g0, g1):
            scale = float(np.max(np.abs(np.asarray(a)))) or 1.0
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       rtol=2e-6, atol=2e-6)
        # and the formulation directly, for the routing-independent oracle
        dkt = fastconv._wgradT_co1(x, cot, (k, k, k), strides, pads)
        scale = float(np.max(np.abs(np.asarray(g0[1])))) or 1.0
        np.testing.assert_allclose(np.asarray(g0[1]) / scale,
                                   np.asarray(dkt) / scale,
                                   rtol=2e-6, atol=2e-6)
