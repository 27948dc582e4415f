"""On-device image-quality metrics: MAE, MSE, PSNR, SSIM, mutual information.

Replaces the reference's eval stack so evaluation never leaves the chip
(SURVEY.md L5):
  * MAE — torchmetrics.MeanAbsoluteError loop
    (/root/reference/code/GAN/inferrence.py:141,181);
  * MSE triplets {gen-vs-gt, gt-vs-gt, t1-vs-gt} — metrics.py:213-218;
  * PSNR/SSIM with data_range=256 — psnr_ssim_metric.py:88-96 (skimage
    defaults: 7^3 uniform window, K1=0.01, K2=0.03, sample covariance,
    mean over the valid region) — `ssim3d` reproduces the skimage formula
    exactly (see tests/test_metrics.py oracle);
  * Mutual information — the external BRAINS-style ImageCompare tool
    (code/eval/*.xml) computed per-pair MI; `mutual_information` is a
    joint-histogram MI in nats over a fixed intensity range.

All functions are jit-compatible with static shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def mae(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def psnr(ref: jax.Array, test: jax.Array, data_range: float = 256.0) -> jax.Array:
    """skimage peak_signal_noise_ratio(ref, test, data_range)."""
    err = mse(ref, test)
    return 10.0 * jnp.log10((data_range * data_range) / err)


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """Mean over win^3 neighborhoods, VALID — separable 1D convs (MXU/VPU
    friendly; no gathers)."""
    # cumulative-sum box filter per axis (exact, O(n), no gathers)
    def box1d(v, axis):
        v = jnp.moveaxis(v, axis, 0)
        cs = jnp.cumsum(v, axis=0)
        head = cs[win - 1 : win]  # sum of first win
        rest = cs[win:] - cs[:-win]
        out = jnp.concatenate([head, rest], axis=0) / win
        return jnp.moveaxis(out, 0, axis)

    for ax in range(3):
        x = box1d(x, ax)
    return x


def ssim3d(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 256.0,
    win: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """skimage structural_similarity for 3D volumes (gaussian_weights=False).

    mean over the valid region of
      ((2 ux uy + C1)(2 cov + C2)) / ((ux^2 + uy^2 + C1)(vx + vy + C2))
    with sample (N/(N-1)) covariance normalization, N = win^3.
    """
    x = a.astype(jnp.float32)
    y = b.astype(jnp.float32)
    ux = _uniform_filter_valid(x, win)
    uy = _uniform_filter_valid(y, win)
    uxx = _uniform_filter_valid(x * x, win)
    uyy = _uniform_filter_valid(y * y, win)
    uxy = _uniform_filter_valid(x * y, win)
    np_ = win ** 3
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return jnp.mean(s)


def joint_histogram(
    a: jax.Array, b: jax.Array, bins: int, vmin: float, vmax: float
) -> jax.Array:
    """(bins, bins) joint count histogram over [vmin, vmax]."""
    scale = bins / (vmax - vmin)
    ia = jnp.clip(((a.reshape(-1) - vmin) * scale).astype(jnp.int32), 0, bins - 1)
    ib = jnp.clip(((b.reshape(-1) - vmin) * scale).astype(jnp.int32), 0, bins - 1)
    flat = ia * bins + ib
    h = jnp.zeros((bins * bins,), jnp.float32).at[flat].add(1.0)
    return h.reshape(bins, bins)


def mutual_information(
    a: jax.Array,
    b: jax.Array,
    bins: int = 64,
    vmin: float = 0.0,
    vmax: float = 256.0,
) -> jax.Array:
    """Joint-histogram MI in nats (on-device equivalent of the external
    ImageCompare tool behind code/eval/*.xml)."""
    h = joint_histogram(a, b, bins, vmin, vmax)
    n = jnp.sum(h)
    p = h / n
    px = jnp.sum(p, axis=1, keepdims=True)
    py = jnp.sum(p, axis=0, keepdims=True)
    mask = p > 0
    ratio = jnp.where(mask, p / jnp.maximum(px * py, 1e-30), 1.0)
    return jnp.sum(jnp.where(mask, p * jnp.log(ratio), 0.0))


def evaluation_suite(
    t2_gen: jax.Array,
    t2_gt: jax.Array,
    t1_gt: Optional[jax.Array] = None,
    data_range: float = 256.0,
) -> Dict[str, jax.Array]:
    """The full per-case metric set the reference spreads across
    inferrence.py / metrics.py / psnr_ssim_metric.py / eval XMLs —
    gen-vs-gt plus the T1 identity baseline when t1_gt is given."""
    out = {
        "mae_t2gen_vs_t2gt": mae(t2_gen, t2_gt),
        "mse_t2gen_vs_t2gt": mse(t2_gen, t2_gt),
        "psnr_t2gen_vs_t2gt": psnr(t2_gt, t2_gen, data_range),
        "ssim_t2gen_vs_t2gt": ssim3d(t2_gt, t2_gen, data_range),
        "mi_t2gen_vs_t2gt": mutual_information(t2_gen, t2_gt, vmax=data_range),
        # self-MI = entropy of the ground truth — the reference's MI ceiling
        # anchor (code/eval/t2_gt_vs_t2_gt.xml, mean 0.445)
        "mi_t2gt_vs_t2gt": mutual_information(t2_gt, t2_gt, vmax=data_range),
    }
    if t1_gt is not None:
        out.update(
            {
                "mae_t1gt_vs_t2gt": mae(t1_gt, t2_gt),
                "mse_t1gt_vs_t2gt": mse(t1_gt, t2_gt),
                "psnr_t1gt_vs_t2gt": psnr(t2_gt, t1_gt, data_range),
                "ssim_t1gt_vs_t2gt": ssim3d(t2_gt, t1_gt, data_range),
                "mi_t1gt_vs_t2gt": mutual_information(t1_gt, t2_gt, vmax=data_range),
            }
        )
    return out
