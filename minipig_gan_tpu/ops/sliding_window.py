"""Sliding-window 3D inference — static-shape, scan-based, jit-compatible.

The reference imports monai's `sliding_window_inference` and leaves it
commented out as its >128^3 scaling hook (/root/reference/code/GAN/
GAN_final.py:24, minipig_inference.py:110-114). This is the TPU-native
version: window starts are computed statically from (volume shape, roi,
overlap), windows are processed in fixed-size batches inside a `lax.scan`
(ONE compiled model program regardless of volume size), and outputs are
blended by scatter-add with a constant or gaussian importance map exactly in
MONAI's blend-weight style.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_starts(dim: int, roi: int, overlap: float) -> np.ndarray:
    """MONAI-style dense interval starts: stride = roi*(1-overlap), last
    window clamped flush with the edge."""
    roi = min(roi, dim)
    stride = max(1, int(roi * (1.0 - overlap)))
    starts = list(range(0, max(dim - roi, 0) + 1, stride))
    if starts[-1] != dim - roi:
        starts.append(dim - roi)
    return np.unique(np.asarray(starts, np.int64))


def gaussian_importance(roi: Tuple[int, int, int], sigma_scale: float = 0.125
                        ) -> np.ndarray:
    """MONAI GaussianFilter importance map: centered gaussian, sigma =
    sigma_scale * roi, normalized to max 1, floored to >0."""
    grids = []
    for r in roi:
        x = np.arange(r, dtype=np.float64) - (r - 1) / 2.0
        sigma = sigma_scale * r
        grids.append(np.exp(-0.5 * (x / sigma) ** 2))
    w = grids[0][:, None, None] * grids[1][None, :, None] * grids[2][None, None, :]
    w = w / w.max()
    return np.maximum(w, np.finfo(np.float32).tiny).astype(np.float32)


def sliding_window_inference(
    vol: jax.Array,
    roi_size: Tuple[int, int, int],
    predictor: Callable[[jax.Array], jax.Array],
    sw_batch_size: int = 4,
    overlap: float = 0.25,
    mode: str = "constant",
) -> jax.Array:
    """vol: (D, H, W, C) single volume -> predictor applied per (roi, C)
    window batch -> blended (D, H, W, C_out).

    `predictor` maps (N, *roi, C) -> (N, *roi, C_out) (e.g. the jitted
    generator apply). Window count is static; windows are padded up to a
    multiple of `sw_batch_size` and processed under lax.scan.
    """
    d, h, w, c = vol.shape
    roi = tuple(min(r, s) for r, s in zip(roi_size, (d, h, w)))
    zs = window_starts(d, roi[0], overlap)
    ys = window_starts(h, roi[1], overlap)
    xs = window_starts(w, roi[2], overlap)
    corners = np.stack(np.meshgrid(zs, ys, xs, indexing="ij"), -1).reshape(-1, 3)
    n_windows = corners.shape[0]
    n_batches = math.ceil(n_windows / sw_batch_size)
    pad_to = n_batches * sw_batch_size
    corners = np.concatenate(
        [corners, np.repeat(corners[-1:], pad_to - n_windows, 0)]
    )
    # padded windows get weight 0 so duplicates don't bias the blend
    valid = (np.arange(pad_to) < n_windows).astype(np.float32)
    corners_dev = jnp.asarray(corners.reshape(n_batches, sw_batch_size, 3))
    valid_dev = jnp.asarray(valid.reshape(n_batches, sw_batch_size))

    if mode == "gaussian":
        importance = jnp.asarray(gaussian_importance(roi))
    else:
        importance = jnp.ones(roi, jnp.float32)

    def gather_window(corner):
        return jax.lax.dynamic_slice(vol, (corner[0], corner[1], corner[2], 0),
                                     (*roi, c))

    c_out_shape = jax.eval_shape(
        predictor, jax.ShapeDtypeStruct((sw_batch_size, *roi, c), vol.dtype)
    )
    c_out = c_out_shape.shape[-1]

    out0 = jnp.zeros((d, h, w, c_out), jnp.float32)
    cnt0 = jnp.zeros((d, h, w, 1), jnp.float32)

    def body(carry, inp):
        out, cnt = carry
        batch_corners, batch_valid = inp
        windows = jax.vmap(gather_window)(batch_corners)
        preds = predictor(windows).astype(jnp.float32)

        def scatter_one(carry, item):
            out, cnt = carry
            corner, pred, v = item
            wmap = importance[..., None] * v
            patch_out = jax.lax.dynamic_slice(
                out, (corner[0], corner[1], corner[2], 0), (*roi, c_out))
            patch_cnt = jax.lax.dynamic_slice(
                cnt, (corner[0], corner[1], corner[2], 0), (*roi, 1))
            out = jax.lax.dynamic_update_slice(
                out, patch_out + pred * wmap, (corner[0], corner[1], corner[2], 0))
            cnt = jax.lax.dynamic_update_slice(
                cnt, patch_cnt + wmap[..., :1], (corner[0], corner[1], corner[2], 0))
            return (out, cnt), None

        (out, cnt), _ = jax.lax.scan(
            scatter_one, (out, cnt), (batch_corners, preds, batch_valid))
        return (out, cnt), None

    (out, cnt), _ = jax.lax.scan(body, (out0, cnt0), (corners_dev, valid_dev))
    return out / jnp.maximum(cnt, 1e-8)
