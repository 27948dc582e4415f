"""Eval-time BatchNorm folding: bake running stats into conv weights.

In eval mode BatchNorm is a fixed per-channel affine
``y = (x - mean) * scale / sqrt(var + eps) + bias`` — it commutes with the
preceding convolution, so the whole layer collapses to a convolution with
rescaled kernel and shifted bias:

    inv = scale / sqrt(var + eps)
    W'  = W * inv   (broadcast over the kernel's OUT-channel axis)
    b'  = (b - mean) * inv + bias

On this chip that matters: TPU convolutions are library calls without
fused epilogues, so every BN affine is its own full-resolution HBM pass —
profiling shows the CasNet eval forward is ~80% elementwise/copies
(BENCH_NOTES.md round-3). Folding removes one pass per conv.

`fold_batchnorm` maps a trained ``{params, batch_stats}`` pair for a
norm="batch" generator onto the parameter tree of the IDENTICAL
architecture built with norm=None (models/unet3d.py). Works for both
plain and nn.scan-stacked (leading block axis) parameters.

The reference has no analogue (torch eval BN stays a separate cuDNN op);
this is TPU-native inference optimization on top of parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _fold_one(conv: Dict[str, Any], norm_p: Dict[str, Any],
              norm_s: Dict[str, Any], *, transposed: bool,
              eps: float = 1e-5) -> Dict[str, Any]:
    kernel = conv["kernel"]
    # Conv3d kernels are (..., k,k,k, in, out); ConvTranspose3d stores
    # (..., k,k,k, out, in) (models/layers.py) -> out axis -2.
    out_axis = -2 if transposed else -1
    inv = norm_p["scale"] / jnp.sqrt(norm_s["var"] + eps)
    shift = norm_p["bias"] - norm_s["mean"] * inv
    shape = [1] * kernel.ndim
    shape[out_axis] = kernel.shape[out_axis]
    lead = inv.ndim - 1  # nn.scan stacking: leading block axis on every leaf
    if lead:
        shape[:lead] = inv.shape[:lead]
    kernel = (kernel * inv.reshape(shape)).astype(kernel.dtype)
    bias = conv.get("bias")
    if bias is not None:
        bias = (bias * inv + shift).astype(bias.dtype)
    else:
        bias = shift
    return {"kernel": kernel, "bias": bias}


def fold_batchnorm(params: Any, batch_stats: Any, eps: float = 1e-5) -> Any:
    """Return a norm=None-shaped params tree with BN folded into convs.

    Walks the tree; wherever a module holds both a ``conv`` and a ``norm``
    child (the MONAI `Convolution` pattern, models/unet3d.py), the norm is
    folded into the conv and dropped. The ``up`` modules are the transposed
    convolutions (kernel layout differs). Standalone convs (``residual``)
    and activation params pass through unchanged.
    """

    def walk(p: Any, s: Any, name: str) -> Any:
        if not isinstance(p, dict):
            return p
        if "conv" in p and "norm" in p:
            folded = dict(p)
            folded["conv"] = _fold_one(
                p["conv"], p["norm"], (s or {}).get("norm", {}),
                transposed=(name == "up"), eps=eps)
            del folded["norm"]
            return {k: walk(v, (s or {}).get(k), k) if k != "conv" else v
                    for k, v in folded.items()}
        return {k: walk(v, (s or {}).get(k), k) for k, v in p.items()}

    return walk(params, batch_stats or {}, "")


def folded_generator(generator, params: Any, batch_stats: Any):
    """Build the norm-free twin of `generator` plus its folded params.

    Returns (module, params). The twin shares every structural field, so
    the folded tree lines up name-for-name.
    """
    folded = fold_batchnorm(params, batch_stats)
    twin = generator.clone(norm=None)
    return twin, folded
