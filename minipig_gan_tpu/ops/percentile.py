"""On-device percentile intensity windowing (★NATIVE item 5, SURVEY.md §2).

Reproduces MONAI `ScaleIntensityRangePercentilesd(lower, upper, b_min, b_max,
clip, relative=False)` as used in the reference:
  * training window: 1st..99th percentile -> [-1, 1], clipped
    (/root/reference/code/GAN/GAN_final.py:386-394);
  * eval rescale: 0..100th percentile -> [0, 255], clipped, then rounded
    (inferrence.py:150-162,188-199).

MONAI computes a_min/a_max with np.percentile (linear interpolation) over the
whole volume and then applies the ScaleIntensityRange affine. `jnp.percentile`
matches numpy's linear method; the sort-based exact percentile of a 128^3
volume is cheap relative to the conv stack, and an O(n) two-pass histogram
approximation is provided for streaming preprocessing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def percentile_window(
    vol: jax.Array, lower: float, upper: float
) -> Tuple[jax.Array, jax.Array]:
    """Exact (a_min, a_max) = percentile(vol, [lower, upper]), linear interp."""
    q = jnp.percentile(
        vol.astype(jnp.float32).reshape(-1), jnp.asarray([lower, upper], jnp.float32)
    )
    return q[0], q[1]


def scale_intensity_range(
    vol: jax.Array, a_min, a_max, b_min: float, b_max: float, clip: bool
) -> jax.Array:
    """MONAI ScaleIntensityRange: (v - a_min)/(a_max - a_min)*(b_max-b_min)+b_min."""
    v = vol.astype(jnp.float32)
    denom = a_max - a_min
    denom = jnp.where(denom == 0, 1.0, denom)
    out = (v - a_min) / denom * (b_max - b_min) + b_min
    if clip:
        out = jnp.clip(out, min(b_min, b_max), max(b_min, b_max))
    return out


def scale_intensity_range_percentiles(
    vol: jax.Array,
    lower: float = 1.0,
    upper: float = 99.0,
    b_min: float = -1.0,
    b_max: float = 1.0,
    clip: bool = True,
) -> jax.Array:
    a_min, a_max = percentile_window(vol, lower, upper)
    return scale_intensity_range(vol, a_min, a_max, b_min, b_max, clip)


def approx_percentile_window(
    vol: jax.Array, lower: float, upper: float, bins: int = 4096
) -> Tuple[jax.Array, jax.Array]:
    """O(n) histogram percentile (two passes, no sort) — for the streaming
    preprocessing path where exactness below ~1e-3 of the intensity range
    doesn't matter. Linear interpolation within the containing bin."""
    v = vol.astype(jnp.float32).reshape(-1)
    vmin = jnp.min(v)
    vmax = jnp.max(v)
    scale = jnp.where(vmax > vmin, (bins - 1) / (vmax - vmin), 0.0)
    idx = jnp.clip(((v - vmin) * scale).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    cdf = jnp.cumsum(hist)
    n = v.shape[0]

    def q(p):
        target = p / 100.0 * (n - 1)
        bin_idx = jnp.searchsorted(cdf, target + 1.0)
        bin_idx = jnp.clip(bin_idx, 0, bins - 1)
        prev = jnp.where(bin_idx > 0, cdf[bin_idx - 1], 0.0)
        cnt = jnp.maximum(cdf[bin_idx] - prev, 1.0)
        frac = jnp.clip((target + 1.0 - prev) / cnt, 0.0, 1.0)
        width = jnp.where(scale > 0, 1.0 / scale, 0.0)
        return vmin + (bin_idx.astype(jnp.float32) + frac) * width

    return q(lower), q(upper)


def rescale_to_uint8_range(vol: jax.Array) -> jax.Array:
    """Eval-path rescale: full range -> [0, 255], rounded
    (inferrence.py:150-162: lower=0, upper=100, b 0..255, clip, round)."""
    out = scale_intensity_range_percentiles(vol, 0.0, 100.0, 0.0, 255.0, True)
    return jnp.round(out)
