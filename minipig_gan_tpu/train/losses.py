"""GAN losses matching the reference formulas.

Reference:
  * adversarial: `F.binary_cross_entropy(y_hat, y)` on sigmoid outputs
    (/root/reference/code/GAN/GAN_final.py:244-245). We compute the identical
    quantity from logits (`bce_with_logits`) — numerically stable on TPU,
    mathematically equal to sigmoid+BCE.
  * reconstruction: `F.l1_loss` (GAN_final.py:247-248).
  * perceptual: sum over discriminator activation taps of
    `F.l1_loss(act_fake, act_real) / act.numel()` — note the reference divides
    the already-mean L1 by numel again (test_runs/GAN.py:288-298); reproduced
    verbatim.
  * one-sided label smoothing: real labels scaled by 0.9 for the D real term
    only (GAN_final.py:280; test_runs/GAN.py:409-412).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """mean BCE computed from logits: mean(softplus(x) - t*x).

    Equals F.binary_cross_entropy(sigmoid(x), t) exactly (up to fp rounding):
    -t*log(s) - (1-t)*log(1-s) = softplus(x) - t*x.
    """
    logits = logits.astype(jnp.float32)
    targets = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), logits.shape)
    return jnp.mean(jax.nn.softplus(logits) - targets * logits)


def bce(probs: jax.Array, targets: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Plain BCE on probabilities (reference-exact API for eval paths).

    torch clamps each log term at -100; we clamp the input instead, which is
    only reachable for saturated sigmoids."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    t = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), p.shape)
    return jnp.mean(-(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p)))


def l1_loss(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    """F.l1_loss (mean reduction)."""
    return jnp.mean(jnp.abs(y_hat.astype(jnp.float32) - y.astype(jnp.float32)))


def mse_loss(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(y_hat.astype(jnp.float32) - y.astype(jnp.float32)))


def perceptual_loss(
    acts_fake: Sequence[jax.Array], acts_real: Sequence[jax.Array]
) -> jax.Array:
    """Sum_k l1_mean(fake_k, real_k) / numel(real_k) (test_runs/GAN.py:288-298)."""
    assert len(acts_fake) == len(acts_real)
    total = jnp.float32(0.0)
    for af, ar in zip(acts_fake, acts_real):
        numel = 1
        for s in ar.shape:
            numel *= s
        total = total + l1_loss(af, ar) / numel
    return total


def generator_loss(
    fake_logits: jax.Array,
    generated: jax.Array,
    target: jax.Array,
    acts_fake: Sequence[jax.Array] = (),
    acts_real: Sequence[jax.Array] = (),
    use_perceptual: bool = False,
) -> Dict[str, jax.Array]:
    """g_loss = BCE(D(G(x)), 1) + L1(G(x), y) [+ perceptual]
    (GAN_final.py:254-273; test_runs/GAN.py:339-401)."""
    g_adv = bce_with_logits(fake_logits, 1.0)
    g_recon = l1_loss(generated, target)
    out = {"g_adv_loss": g_adv, "g_recon_loss": g_recon}
    g = g_adv + g_recon
    if use_perceptual:
        g_perc = perceptual_loss(list(acts_fake), list(acts_real))
        out["g_perceptual_loss"] = g_perc
        g = g + g_perc
    out["g_loss"] = g
    return out


def discriminator_loss(
    real_logits: jax.Array,
    fake_logits: jax.Array,
    one_sided_label_value: float = 0.9,
) -> Dict[str, jax.Array]:
    """d_loss = (BCE(D(real), 0.9) + BCE(D(fake), 0)) / 2
    (GAN_final.py:276-296)."""
    real_loss = bce_with_logits(real_logits, one_sided_label_value)
    fake_loss = bce_with_logits(fake_logits, 0.0)
    return {
        "d_real_loss": real_loss,
        "d_fake_loss": fake_loss,
        "d_loss": (real_loss + fake_loss) / 2.0,
    }
