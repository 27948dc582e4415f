"""Discriminators for the cross-modality GAN, TPU-native (NDHWC).

Three variants, mirroring the reference's experiments:

* `GlobalDiscriminator` — the canonical "old" discriminator
  (/root/reference/code/GAN/GAN_final.py:159-209): on a 128^3 volume,
  Conv3d(1->64, k3, s1, VALID) + BN + LeakyReLU(0.2)
  Conv3d(64->128, k3, s1, VALID) + BN + LReLU
  Conv3d(128->256, k4, s2, VALID) + BN + LReLU
  Conv3d(256->256, k4, s2, VALID) + BN + LReLU      -> 29^3 x 256 features
  Flatten -> Linear(256*29^3 -> 1) -> sigmoid.

* `PatchPerceptualDiscriminator` — the patch + perceptual-taps variant
  (/root/reference/test_runs/GAN.py:136-198): on 16^3 patches,
  4x [Conv3d(k3, s1, VALID) 1->64->128->256->512 + BN + LReLU],
  Flatten -> Linear(512*8^3 -> 64) -> Linear(64 -> 1) -> sigmoid; forward
  returns (validity, activations) where activations capture the output of
  EVERY sub-layer (conv, norm, and act each produce a tap, then each linear
  stage) exactly as the reference's per-module loop does.

* `MonaiDiscriminator` — the early MONAI `Discriminator` experiment
  (/root/reference/test_runs/perceptual_test.py:127-141): exact MONAI 0.4.0
  topology — 7 stride-2 ResidualUnits (channels 8..256,1; norm=None, PReLU,
  subunits=2), Flatten -> Linear -> sigmoid 1-logit head.

All discriminators RETURN LOGITS; apply `jax.nn.sigmoid` (or use the
from-logits BCE in train/losses.py, which is the numerically stable identical
computation) to recover the reference's sigmoid outputs.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm3d, Conv3d, Dense, leaky_relu


class _DiscBlock(nn.Module):
    """conv -> BN -> LeakyReLU(0.2), one reference discriminator block.

    The reference's VALID convs (padding=0, GAN_final.py:165-189) produce
    odd spatial extents (126^3, 124^3). As a STANDALONE chain on the v5e
    those extents defeat the (8,128) tiling: 3.6 TF/s VALID vs 145.9 TF/s
    when computed as a SAME conv whose border is cropped off
    (tpu_tests/disc_pad_experiment.py). Cropping the interior of a
    zero-padded conv is EXACTLY the VALID result — only the dropped border
    rows touch the pad zeros (verified max|diff| = 0.0 on chip). Inside
    the full jit'd train step the rewrite measures NEUTRAL (XLA's
    in-program layout assignment already avoids the pathology;
    BENCH_NOTES.md round-3), so this mainly protects entry-point /
    layout-constrained contexts. Enabled for stride-1 blocks on large
    volumes; the border arithmetic overhead is (s/(s-k+1))^3 (~5% at
    128^3).
    """

    features: int
    kernel: int
    stride: int
    same_crop: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.same_crop and self.stride == 1:
            p = (self.kernel - 1) // 2
            x = Conv3d(self.features, kernel_size=self.kernel,
                       strides=self.stride, padding=p, dtype=self.dtype,
                       name="conv")(x)
            x = x[:, p:-p or None, p:-p or None, p:-p or None, :]
        else:
            x = Conv3d(self.features, kernel_size=self.kernel,
                       strides=self.stride, padding=0, dtype=self.dtype,
                       name="conv")(x)
        x = BatchNorm3d(axis_name=self.bn_axis_name, name="norm")(x, train)
        return leaky_relu(x, 0.2)


class GlobalDiscriminator(nn.Module):
    """Whole-volume discriminator (GAN_final.py:159-209). Returns logits (N, 1).

    `remat=True` rematerializes each block in the backward pass — at 128^3 the
    first two stride-1 blocks hold 64ch@126^3 / 128ch@124^3 activations
    (2-4 GB per batch of 4 in bf16), so keeping only block BOUNDARIES live is
    what fits whole-volume GAN training in one chip's HBM.
    """

    features: Tuple[int, ...] = (64, 128, 256, 256)
    remat: bool = True
    # None = auto (on for volumes >= 64^3); see _DiscBlock docstring
    same_crop: Optional[bool] = None
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        specs = [
            (self.features[0], 3, 1),
            (self.features[1], 3, 1),
            (self.features[2], 4, 2),
            (self.features[3], 4, 2),
        ]
        block_cls = (
            nn.remat(_DiscBlock, prevent_cse=False, static_argnums=(2,))
            if self.remat
            else _DiscBlock
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # SAME+crop rewrite (see _DiscBlock) pays off only when the tiling
        # win dwarfs the ~(s/(s-2))^3 border arithmetic — large volumes.
        same_crop = (min(x.shape[1:4]) >= 64 if self.same_crop is None
                     else self.same_crop)
        for i, (f, k, s) in enumerate(specs):
            x = block_cls(f, k, s, same_crop=same_crop,
                          bn_axis_name=self.bn_axis_name,
                          dtype=self.dtype, name=f"block{i}")(x, train)
        # Flatten. torch flattens NCDHW as (C, D, H, W) row-major; our layout is
        # NDHWC. The Linear head is ours to train, so the permutation is only a
        # weight-ordering convention — keep NDHWC order (TPU-friendly layout).
        x = x.reshape(x.shape[0], -1)
        x = Dense(1, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)


class PatchPerceptualDiscriminator(nn.Module):
    """Patch discriminator with perceptual activation taps
    (test_runs/GAN.py:136-198). Input: (N, 16, 16, 16, 1) patches.

    Returns (logits (N,1), activations list). When `capture_activations` is
    False the taps are skipped (mirrors use_perceptual=False in GAN2.py:137).
    """

    features: Tuple[int, ...] = (64, 128, 256, 512)
    hidden: int = 64
    capture_activations: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True
    ) -> Tuple[jax.Array, List[jax.Array]]:
        acts: List[jax.Array] = []

        def tap(v):
            if self.capture_activations:
                acts.append(v)
            return v

        for i, f in enumerate(self.features):
            x = tap(Conv3d(f, kernel_size=3, strides=1, padding=0,
                           dtype=self.dtype, name=f"conv{i}")(x))
            x = tap(BatchNorm3d(axis_name=self.bn_axis_name, name=f"norm{i}")(x, train))
            x = tap(leaky_relu(x, 0.2))
        x = tap(x.reshape(x.shape[0], -1))
        x = tap(Dense(self.hidden, dtype=self.dtype, name="fc0")(x))
        logits = Dense(1, dtype=self.dtype, name="fc1")(x)
        tap(logits)
        tap(jax.nn.sigmoid(logits.astype(jnp.float32)))
        return logits.astype(jnp.float32), acts


class MonaiDiscriminator(nn.Module):
    """Exact MONAI 0.4.0 ``Discriminator`` topology, as the reference
    configures it (/root/reference/test_runs/perceptual_test.py:127-141):

        Discriminator(img_shape, channels=(8,16,32,64,128,256,1),
                      strides=(2,2,2,2,2,2,2,1), num_res_units=2,
                      kernel_size=3, act="PRELU", norm=None,
                      last_act="SIGMOID")

    MONAI's ``Regressor`` lineage zips channels with strides (the trailing
    stride-1 entry is unused), building one ``ResidualUnit(subunits=2,
    norm=None, act=PRELU, last_conv_only=is_last)`` per channel entry, then a
    ``Flatten -> Linear(prod(final_shape) -> 1)`` head with sigmoid last_act.
    With norm=None each sub-convolution is conv -> PReLU (no BatchNorm).

    MONAI 0.4.0's ``Discriminator.__init__`` defaults ``dropout=0.25`` and
    the reference call does not override it — so the real module applies
    nn.Dropout(0.25) between conv and PReLU (ADN "NDA" order with
    norm=None) in every non-final sub-convolution at train time
    (docs/AUDIT_MONAI_040.md §3). Reproduced here; train-mode apply needs
    ``rngs={"dropout": ...}``; eval is deterministic.

    Returns LOGITS (N, 1); apply sigmoid / from-logits BCE for the
    reference's SIGMOID last_act.
    """

    channels: Tuple[int, ...] = (8, 16, 32, 64, 128, 256, 1)
    strides: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 1)
    num_res_units: int = 2
    kernel_size: int = 3
    dropout: float = 0.25
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        from .unet3d import Convolution, ResidualUnit

        if self.dtype is not None:
            x = x.astype(self.dtype)
        pairs = list(zip(self.channels, self.strides))
        for i, (c, s) in enumerate(pairs):
            is_last = i == len(pairs) - 1
            if self.num_res_units > 0:
                x = ResidualUnit(
                    c, strides=s, kernel_size=self.kernel_size,
                    subunits=self.num_res_units, last_conv_only=is_last,
                    norm=None, dropout=self.dropout,
                    bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype, name=f"layer{i}",
                )(x, train)
            else:
                x = Convolution(
                    c, strides=s, kernel_size=self.kernel_size,
                    conv_only=is_last, norm=None, dropout=self.dropout,
                    bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                    name=f"layer{i}",
                )(x, train)
        x = x.reshape(x.shape[0], -1)
        x = Dense(1, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)


# Back-compat alias (pre-round-2 name for the then-approximate topology).
MonaiStyleDiscriminator = MonaiDiscriminator
