"""Shape/geometry unit tests mirroring the reference smoke scripts
(test_runs/generator_test.py:79-89, test_runs/discriminator_test.py:91-101)
— exact canonical geometries checked via jax.eval_shape (no FLOPs), small
real forwards for numerics/range.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minipig_gan_tpu.models import (
    CasNetGenerator,
    GlobalDiscriminator,
    MonaiStyleDiscriminator,
    PatchPerceptualDiscriminator,
    UNet3D,
)


def test_casnet_128_geometry_eval_shape():
    """Canonical config (GAN_final.py:100-119): 1x128^3 in -> 1x128^3 out."""
    g = CasNetGenerator()  # 6 blocks, channels (16,32,64,128), strides (2,2,2)
    x = jax.ShapeDtypeStruct((1, 128, 128, 128, 1), jnp.float32)

    def init_and_run(rng):
        out, _ = g.init_with_output(rng, jnp.zeros(x.shape, x.dtype), train=False)
        return out

    out = jax.eval_shape(init_and_run, jax.random.PRNGKey(0))
    assert out.shape == (1, 128, 128, 128, 1)


def test_global_discriminator_128_to_29_geometry():
    """GAN_final.py:165-204: 128^3 input yields a 29^3 x 256 feature map
    before the Linear(256*29^3 -> 1) head."""
    d = GlobalDiscriminator()
    x = jnp.zeros((2, 128, 128, 128, 1))
    variables = jax.eval_shape(lambda r: d.init(r, x, train=False), jax.random.PRNGKey(0))
    head_kernel = variables["params"]["head"]["kernel"]
    assert head_kernel.shape == (256 * 29 * 29 * 29, 1)
    out = jax.eval_shape(
        lambda v: d.apply(v, x, train=False), variables
    )
    assert out.shape == (2, 1)


def test_patch_discriminator_16_to_8_geometry():
    """test_runs/GAN.py:142-181: 16^3 patches -> 8^3 x 512 -> 64 -> 1."""
    d = PatchPerceptualDiscriminator()
    x = jnp.zeros((128, 16, 16, 16, 1))
    variables = jax.eval_shape(lambda r: d.init(r, x, train=False), jax.random.PRNGKey(0))
    assert variables["params"]["fc0"]["kernel"].shape == (512 * 8 * 8 * 8, 64)
    (logits, acts) = jax.eval_shape(
        lambda v: d.apply(v, x, train=False), variables
    )
    assert logits.shape == (128, 1)
    assert len(acts) == 16  # 4 x (conv, bn, lrelu) + flatten + fc0 + fc1 + sigmoid


@pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)
def test_casnet_output_in_tanh_range():
    g = CasNetGenerator(n_unet_blocks=2, channels=(4, 8), strides=(2,))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1), jnp.float32)
    y, _ = g.init_with_output(jax.random.PRNGKey(1), x, train=True)
    y = np.asarray(y[0] if isinstance(y, tuple) else y)
    assert y.shape == (1, 8, 8, 8, 1)
    assert np.all(y >= -1.0) and np.all(y <= 1.0)


def test_casnet_scan_and_loop_param_count_match():
    """scan-stacked params must hold exactly n_blocks x per-block params."""
    kwargs = dict(n_unet_blocks=3, channels=(4, 8), strides=(2,))
    x = jnp.zeros((1, 8, 8, 8, 1))
    rng = jax.random.PRNGKey(0)
    v_scan = jax.eval_shape(
        lambda r: CasNetGenerator(**kwargs, use_scan=True).init(r, x, train=False), rng)
    v_loop = jax.eval_shape(
        lambda r: CasNetGenerator(**kwargs, use_scan=False).init(r, x, train=False), rng)

    def count(tree):
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))

    assert count(v_scan["params"]) == count(v_loop["params"])


def test_monai_discriminator_geometry():
    """128^3 input through 7 stride-2 residual units -> 1^3 x 1ch -> 1 logit
    (perceptual_test.py:127-141 config)."""
    d = MonaiStyleDiscriminator()
    x = jnp.zeros((2, 128, 128, 128, 1))
    out, variables = jax.eval_shape(
        lambda r: d.init_with_output(r, x, train=False), jax.random.PRNGKey(0)
    )
    assert out.shape == (2, 1)
    # head operates on the flattened 1-channel 1^3 final feature map
    assert variables["params"]["head"]["kernel"].shape == (1, 1)
    # 7 layers, each a subunits=2 residual unit with a conv residual branch
    l0 = variables["params"]["layer0"]
    assert set(l0.keys()) == {"unit0", "unit1", "residual"}
    assert "norm" not in l0["unit0"], "norm=None must create no BatchNorm"


def test_unet_7level_variant_geometry():
    """generator_test.py:47-77 variant: 7-level channels (64..512)."""
    m = UNet3D(channels=(64, 128, 256, 512, 512, 512, 512),
               strides=(2, 2, 2, 2, 2, 2), num_res_units=2)
    x = jnp.zeros((1, 128, 128, 128, 1))
    out = jax.eval_shape(
        lambda r: m.init_with_output(r, x, train=False)[0], jax.random.PRNGKey(0)
    )
    assert out.shape == (1, 128, 128, 128, 1)


@pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)
class TestBNFolding:
    """models/fold.py: eval-mode BN folding must reproduce the
    stats-threading forward exactly (up to float fold rounding)."""

    def _trained_like_state(self, gen, x, seed=5):
        """Init, then give every BN layer non-trivial running stats so the
        fold actually has something to fold."""
        v = gen.init(jax.random.PRNGKey(seed), x, train=True)
        rs = np.random.RandomState(seed)

        def scramble(tree, is_var):
            return jax.tree.map(
                lambda a: jnp.asarray(
                    (0.5 + rs.rand(*a.shape)) if is_var
                    else rs.randn(*a.shape) * 0.3, a.dtype), tree)

        stats = {}
        for k, sub in v["batch_stats"].items():
            stats[k] = jax.tree.map(lambda a: a, sub)
        stats = jax.tree.map(lambda a: a, v["batch_stats"])
        # var keys must stay positive; means arbitrary
        def walk(t):
            if isinstance(t, dict):
                return {k: (scramble(x_, k == "var") if k in ("mean", "var")
                            else walk(x_)) for k, x_ in t.items()}
            return t
        stats = walk(stats)
        # scramble affine + conv params a bit too
        params = jax.tree.map(
            lambda a: a + jnp.asarray(rs.randn(*a.shape) * 0.05, a.dtype),
            v["params"])
        return params, stats

    def test_folded_casnet_matches_eval_forward(self):
        from minipig_gan_tpu.models.fold import folded_generator

        gen = CasNetGenerator(n_unet_blocks=2, channels=(4, 8),
                              strides=(2,), use_scan=True, remat=False)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 1),
                        jnp.float32)
        params, stats = self._trained_like_state(gen, x)
        ref = gen.apply({"params": params, "batch_stats": stats}, x,
                        train=False)
        twin, fparams = folded_generator(gen, params, stats)
        got = twin.apply({"params": fparams}, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_folded_unrolled_variant(self):
        from minipig_gan_tpu.models.fold import folded_generator

        gen = CasNetGenerator(n_unet_blocks=2, channels=(4, 8),
                              strides=(2,), use_scan=False, remat=False)
        x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 16, 1),
                        jnp.float32)
        params, stats = self._trained_like_state(gen, x, seed=7)
        ref = gen.apply({"params": params, "batch_stats": stats}, x,
                        train=False)
        twin, fparams = folded_generator(gen, params, stats)
        got = twin.apply({"params": fparams}, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)
def test_global_discriminator_same_crop_exact():
    """The SAME+crop conv rewrite in the global D (tiling optimization,
    tpu_tests/disc_pad_experiment.py) must be numerically identical to the
    reference VALID formulation — same params, same logits."""
    from minipig_gan_tpu.models import GlobalDiscriminator

    x = jnp.asarray(np.random.RandomState(3).randn(1, 64, 64, 64, 1),
                    jnp.float32)
    d_valid = GlobalDiscriminator(features=(4, 4, 4, 4), same_crop=False,
                                  remat=False)
    d_crop = GlobalDiscriminator(features=(4, 4, 4, 4), same_crop=True,
                                 remat=False)
    v = d_valid.init(jax.random.PRNGKey(0), x, train=False)
    a = d_valid.apply(v, x, train=False)
    b = d_crop.apply(v, x, train=False)  # identical param tree by design
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_unet_surplus_strides_tolerated():
    """MONAI 0.4.0 ignores surplus strides; the reference's 4-block variant
    passes strides=(2,2,2,2) with 4 channels (test_runs/GAN.py:107-108)."""
    m = UNet3D(channels=(4, 8, 16, 32), strides=(2, 2, 2, 2))
    x = jnp.zeros((1, 32, 32, 32, 1))
    out = jax.eval_shape(
        lambda r: m.init_with_output(r, x, train=False)[0],
        jax.random.PRNGKey(0))
    assert out.shape == (1, 32, 32, 32, 1)
