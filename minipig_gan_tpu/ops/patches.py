"""On-device random 3D patch extraction with static shapes.

Replaces the reference's host-side MONAI `RandSpatialCropSamplesd(keys=["t2",
"t2_gt"], roi_size=(16,16,16), num_samples=128)` applied INSIDE training_step
(/root/reference/test_runs/GAN.py:263-272,311-337) — a CPU<->GPU round trip per
step there; here it is a fully on-device gather that jit-fuses into the train
step. Matching MONAI dict-transform semantics, each sampled ROI is applied to
BOTH volumes (generated and ground truth) at the same location.

Shapes are static: (B, D, H, W, C) -> (B * num_samples, *roi, C).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_patch_corners(
    rng: jax.Array,
    batch: int,
    spatial: Tuple[int, int, int],
    roi: Tuple[int, int, int],
    num_samples: int,
) -> jax.Array:
    """Uniform corners, shape (batch, num_samples, 3); corner_i in [0, dim-roi]."""
    maxs = jnp.asarray(
        [spatial[i] - roi[i] for i in range(3)], jnp.int32
    )  # inclusive upper bound
    u = jax.random.uniform(rng, (batch, num_samples, 3))
    return jnp.floor(u * (maxs + 1).astype(jnp.float32)).astype(jnp.int32).clip(0, maxs)


def extract_patches(vols: jax.Array, corners: jax.Array, roi: Tuple[int, int, int]) -> jax.Array:
    """Gather patches. vols (B, D, H, W, C), corners (B, S, 3) ->
    (B*S, roi_d, roi_h, roi_w, C), ordered sample-major per item then item-major
    (matches the reference's re-collation at test_runs/GAN.py:323-337)."""
    ch = vols.shape[-1]

    def one_patch(vol, c):
        return jax.lax.dynamic_slice(vol, (c[0], c[1], c[2], 0), (*roi, ch))

    def one_item(vol, cs):
        return jax.vmap(lambda c: one_patch(vol, c))(cs)

    patches = jax.vmap(one_item)(vols, corners)  # (B, S, *roi, C)
    return patches.reshape(-1, *roi, ch)


def random_patch_pairs(
    rng: jax.Array,
    generated: jax.Array,
    real: jax.Array,
    roi: Tuple[int, int, int] = (16, 16, 16),
    num_samples: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Same random ROIs applied to the generated and ground-truth volumes."""
    assert generated.shape == real.shape
    b = generated.shape[0]
    spatial = generated.shape[1:4]
    corners = sample_patch_corners(rng, b, spatial, roi, num_samples)
    return (
        extract_patches(generated, corners, roi),
        extract_patches(real, corners, roi),
    )
