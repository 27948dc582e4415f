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

import functools
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def extract_patches_fast(vols: jax.Array, corners: jax.Array,
                         roi: Tuple[int, int, int]) -> jax.Array:
    """`extract_patches` with the Pallas DMA kernel as the forward pass
    (ops/pallas/patches_kernel.py) and the XLA scatter-add transpose as the
    backward pass — so patch-mode training can flow generator gradients
    through the crop while the hot forward gather runs as per-patch DMAs.
    Compiled on TPU; interpreted on CPU (tests). Volumes whose minor extent
    W*C is not a multiple of the 128-lane tile can't be DMA-sliced by the
    kernel (Mosaic alignment) and transparently take the XLA gather."""
    from .pallas.patches_kernel import extract_patches_pallas

    if (vols.shape[3] * vols.shape[4]) % 128 != 0:
        return extract_patches(vols, corners, roi)
    interpret = jax.devices()[0].platform == "cpu"
    return extract_patches_pallas(vols, corners, roi, interpret=interpret)


def _patches_fwd(vols, corners, roi):
    return extract_patches_fast(vols, corners, roi), (vols, corners)


def _patches_bwd(roi, res, g):
    vols, corners = res
    # the VJP of a pure gather is a scatter-add of the cotangents at the same
    # corners; reuse XLA's transpose of the dynamic_slice formulation (the
    # primal forward value is dead code XLA eliminates)
    _, vjp = jax.vjp(lambda v: extract_patches(v, corners, roi), vols)
    return (vjp(g.astype(vols.dtype))[0], None)


extract_patches_fast.defvjp(_patches_fwd, _patches_bwd)


def random_patch_pairs(
    rng: jax.Array,
    generated: jax.Array,
    real: jax.Array,
    roi: Tuple[int, int, int] = (16, 16, 16),
    num_samples: int = 128,
    use_pallas: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Same random ROIs applied to the generated and ground-truth volumes.

    `use_pallas=True` routes the crop through the TPU DMA kernel
    (differentiable via extract_patches_fast); the default XLA gather path
    runs everywhere."""
    assert generated.shape == real.shape
    b = generated.shape[0]
    spatial = generated.shape[1:4]
    corners = sample_patch_corners(rng, b, spatial, roi, num_samples)
    extract = extract_patches_fast if use_pallas else (
        lambda v, c, r: extract_patches(v, c, r))
    return (
        extract(generated, corners, roi),
        extract(real, corners, roi),
    )
