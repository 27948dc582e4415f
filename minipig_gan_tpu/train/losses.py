"""GAN losses matching the reference formulas.

Reference:
  * adversarial: `F.binary_cross_entropy(y_hat, y)` on sigmoid outputs
    (/root/reference/code/GAN/GAN_final.py:244-245). We compute the identical
    quantity from logits (`bce_with_logits`) — numerically stable on TPU —
    INCLUDING torch's saturation semantics (log clamp at -100 in the value,
    eps=1e-12 denominator in the backward), which gate the GAN's gradient
    balance; see bce_with_logits docstring.
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


@jax.custom_vjp
def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """mean(BCE(sigmoid(logits), targets)) with torch's EXACT saturation
    semantics — both are load-bearing for GAN training dynamics:

    * forward: torch clamps each log term at -100 (aten BCE:
      log(p).clamp(min=-100)), so a fully saturated term contributes the
      constant 100 nats (checkpoint telemetry g_loss~100.03 in the
      reference comes from exactly this clamp);
    * backward: torch's BCE backward is (p - t) / max(p(1-p), 1e-12), which
      chained through sigmoid' = p(1-p) gives
          d/dx = (p - t) * p(1-p) / max(p(1-p), 1e-12)
      — the adversarial gradient DECAYS once p(1-p) < 1e-12 (|logit| >~ 28)
      and vanishes at f32 sigmoid saturation. When the discriminator
      saturates, the reference generator therefore stops receiving
      adversarial gradient and trains on pure L1 — how its recon loss
      reached ~0.03 while g_adv sat at 100+. A plain from-logits BCE keeps
      a constant +-1 gradient forever and drowns the L1 term; verified
      against torch (value and gradient) in tests/test_losses.py.

    Forward identity: -t*log(s) - (1-t)*log(1-s)
                    = t*softplus(-x) + (1-t)*softplus(x), terms capped at 100.
    """
    x = logits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), x.shape)
    pos = jnp.minimum(jax.nn.softplus(-x), 100.0)  # -log(sigmoid(x))
    neg = jnp.minimum(jax.nn.softplus(x), 100.0)   # -log(1 - sigmoid(x))
    return jnp.mean(t * pos + (1.0 - t) * neg)


def _bce_fwd(logits, targets):
    return bce_with_logits(logits, targets), (logits, targets)


def _bce_bwd(res, g):
    logits, targets = res
    x = logits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), x.shape)
    p = jax.nn.sigmoid(x)
    s = p * (1.0 - p)
    grad = (p - t) * s / jnp.maximum(s, 1e-12)  # torch aten BCE backward
    gx = (g * grad / x.size).astype(logits.dtype)
    return (gx, None)


bce_with_logits.defvjp(_bce_fwd, _bce_bwd)


def bce(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Plain BCE on probabilities (reference-exact API for eval paths),
    with torch's log clamp: each log term floored at -100 (so p=0 against
    target 1 contributes 100 nats, exactly like F.binary_cross_entropy)."""
    p = probs.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), p.shape)
    log_p = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
    return jnp.mean(-(t * log_p + (1.0 - t) * log_1p))


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


def gradient_difference_loss(y_hat: jax.Array, y: jax.Array) -> jax.Array:
    """Mean L1 between the spatial finite differences of prediction and
    target, averaged over the three spatial axes (Mathieu et al. 2015,
    "Deep multi-scale video prediction beyond MSE", alpha=1).

    Reference-plus loss option (no reference analogue): plain L1
    (GAN_final.py:247-248) is minimized by over-smooth outputs, which the
    binned-MI eval (ops/metrics.py::mutual_information) punishes via a
    collapsed marginal-entropy term — see the "Mutual information" section
    of results/README.md. Matching the target's spatial gradients restores
    fine texture without rewarding noise hallucination (unlike an entropy
    bonus, GDL is still zero-minimized at the exact target).

    Inputs are NDHWC (or any layout whose axes 1..3 are spatial)."""
    a = y_hat.astype(jnp.float32)
    b = y.astype(jnp.float32)
    total = jnp.float32(0.0)
    for axis in (1, 2, 3):
        da = jnp.diff(a, axis=axis)
        db = jnp.diff(b, axis=axis)
        total = total + jnp.mean(jnp.abs(da - db))
    return total / 3.0


def generator_loss(
    fake_logits: jax.Array,
    generated: jax.Array,
    target: jax.Array,
    acts_fake: Sequence[jax.Array] = (),
    acts_real: Sequence[jax.Array] = (),
    use_perceptual: bool = False,
    gdl_weight: float = 0.0,
) -> Dict[str, jax.Array]:
    """g_loss = BCE(D(G(x)), 1) + L1(G(x), y) [+ perceptual] [+ w*GDL]
    (GAN_final.py:254-273; test_runs/GAN.py:339-401; GDL is a
    reference-plus option, default off — see gradient_difference_loss)."""
    g_adv = bce_with_logits(fake_logits, 1.0)
    g_recon = l1_loss(generated, target)
    out = {"g_adv_loss": g_adv, "g_recon_loss": g_recon}
    g = g_adv + g_recon
    if use_perceptual:
        g_perc = perceptual_loss(list(acts_fake), list(acts_real))
        out["g_perceptual_loss"] = g_perc
        g = g + g_perc
    if gdl_weight:
        g_gdl = gradient_difference_loss(generated, target)
        out["g_gdl_loss"] = g_gdl
        g = g + gdl_weight * g_gdl
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
