"""Loss parity vs torch.nn.functional (the reference's loss implementations,
GAN_final.py:244-248, test_runs/GAN.py:288-298)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from minipig_gan_tpu.train import losses as L


def test_bce_with_logits_equals_sigmoid_bce():
    rs = np.random.RandomState(0)
    logits = rs.randn(16, 1).astype(np.float32) * 3
    for target in (1.0, 0.9, 0.0):
        ours = float(L.bce_with_logits(jnp.asarray(logits), target))
        torch_val = float(
            F.binary_cross_entropy(
                torch.sigmoid(torch.from_numpy(logits)),
                torch.full((16, 1), target),
            )
        )
        assert abs(ours - torch_val) < 1e-5


def test_bce_on_probs_matches_torch():
    rs = np.random.RandomState(1)
    p = rs.uniform(0.01, 0.99, (8, 1)).astype(np.float32)
    t = rs.randint(0, 2, (8, 1)).astype(np.float32)
    ours = float(L.bce(jnp.asarray(p), jnp.asarray(t)))
    tv = float(F.binary_cross_entropy(torch.from_numpy(p), torch.from_numpy(t)))
    assert abs(ours - tv) < 1e-6


def test_l1_matches_torch():
    rs = np.random.RandomState(2)
    a = rs.randn(2, 4, 4, 4, 1).astype(np.float32)
    b = rs.randn(2, 4, 4, 4, 1).astype(np.float32)
    ours = float(L.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    tv = float(F.l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - tv) < 1e-6


def test_perceptual_matches_reference_formula():
    """sum_k l1_mean/numel — the reference's double normalization
    (test_runs/GAN.py:293-297)."""
    rs = np.random.RandomState(3)
    acts_f = [rs.randn(4, 3, 3, 3, 2).astype(np.float32) for _ in range(3)]
    acts_r = [rs.randn(4, 3, 3, 3, 2).astype(np.float32) for _ in range(3)]
    ours = float(
        L.perceptual_loss([jnp.asarray(a) for a in acts_f],
                          [jnp.asarray(a) for a in acts_r])
    )
    expected = 0.0
    for af, ar in zip(acts_f, acts_r):
        expected += float(
            F.l1_loss(torch.from_numpy(ar), torch.from_numpy(af))
        ) / ar.size
    assert abs(ours - expected) < 1e-8


def test_discriminator_loss_formula():
    rs = np.random.RandomState(4)
    rl = jnp.asarray(rs.randn(4, 1).astype(np.float32))
    fl = jnp.asarray(rs.randn(4, 1).astype(np.float32))
    out = L.discriminator_loss(rl, fl, 0.9)
    expected = (float(L.bce_with_logits(rl, 0.9)) + float(L.bce_with_logits(fl, 0.0))) / 2
    assert abs(float(out["d_loss"]) - expected) < 1e-7


def test_bce_saturation_clamp_matches_torch():
    """torch BCE clamps each log term at -100: in deep saturation the loss
    saturates at 100 nats and the gradient is ZERO. Verify value AND
    gradient against torch across moderate and saturated logits."""
    import torch

    from minipig_gan_tpu.train import losses as L

    logits = np.array([-300.0, -150.0, -50.0, -3.0, 0.0, 2.5, 120.0, 400.0],
                      np.float32)
    for target in (1.0, 0.9, 0.0):
        tl = torch.tensor(logits, requires_grad=True)
        tt = torch.full((len(logits),), target)
        tloss = torch.nn.functional.binary_cross_entropy(torch.sigmoid(tl), tt)
        tloss.backward()

        jloss, jgrad = jax.value_and_grad(
            lambda x: L.bce_with_logits(x, target))(jnp.asarray(logits))
        np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jgrad), tl.grad.numpy(),
                                   rtol=1e-4, atol=1e-7)
    # explicit: fully saturated logit -> zero gradient (the property that
    # lets the reference's recon term win once D saturates)
    g = jax.grad(lambda x: L.bce_with_logits(x, 1.0))(jnp.asarray([-500.0]))
    assert float(g[0]) == 0.0


def test_bce_probs_saturation_matches_torch():
    """Probabilities-API BCE with torch's -100 log clamp, incl. p=0 and p=1."""
    import torch

    from minipig_gan_tpu.train import losses as L

    p = np.array([0.0, 1e-30, 0.3, 0.9, 1.0], np.float32)
    for target in (1.0, 0.0, 0.9):
        tt = torch.full((len(p),), target)
        tv = float(torch.nn.functional.binary_cross_entropy(torch.tensor(p), tt))
        jv = float(L.bce(jnp.asarray(p), target))
        np.testing.assert_allclose(jv, tv, rtol=1e-5)


def test_gdl_zero_at_target_positive_for_smooth():
    """gradient_difference_loss is zero-minimized at the exact target and
    penalizes a smoothed (texture-erased) prediction — the property that
    makes it an anti-oversmoothing term (losses.py docstring)."""
    rs = np.random.RandomState(5)
    y = rs.randn(1, 8, 8, 8, 1).astype(np.float32)
    assert float(L.gradient_difference_loss(jnp.asarray(y), jnp.asarray(y))) == 0.0
    smooth = y.copy()
    for ax in (1, 2, 3):
        smooth = 0.5 * smooth + 0.25 * (np.roll(smooth, 1, ax) + np.roll(smooth, -1, ax))
    val = float(L.gradient_difference_loss(jnp.asarray(smooth), jnp.asarray(y)))
    assert val > 0.1


def test_gdl_matches_manual_finite_differences():
    rs = np.random.RandomState(6)
    a = rs.randn(2, 5, 6, 7, 1).astype(np.float32)
    b = rs.randn(2, 5, 6, 7, 1).astype(np.float32)
    expected = np.mean([
        np.abs(np.diff(a, axis=ax) - np.diff(b, axis=ax)).mean()
        for ax in (1, 2, 3)
    ])
    ours = float(L.gradient_difference_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_generator_loss_gdl_term_wiring():
    """gdl_weight>0 adds g_gdl_loss to the dict and w*gdl to g_loss;
    gdl_weight=0 keeps the reference's exact loss surface (no extra key)."""
    rs = np.random.RandomState(7)
    logits = jnp.asarray(rs.randn(2, 1).astype(np.float32))
    gen = jnp.asarray(rs.randn(2, 4, 4, 4, 1).astype(np.float32))
    tgt = jnp.asarray(rs.randn(2, 4, 4, 4, 1).astype(np.float32))
    base = L.generator_loss(logits, gen, tgt)
    assert "g_gdl_loss" not in base
    w = 0.7
    out = L.generator_loss(logits, gen, tgt, gdl_weight=w)
    gdl = float(L.gradient_difference_loss(gen, tgt))
    np.testing.assert_allclose(float(out["g_gdl_loss"]), gdl, rtol=1e-6)
    np.testing.assert_allclose(
        float(out["g_loss"]), float(base["g_loss"]) + w * gdl, rtol=1e-6)
