"""3D U-Net reproducing the MONAI 0.4.0 `UNet` topology, TPU-native (NDHWC).

The reference generator is a cascade of MONAI UNets built as
``UNet(dimensions=3, in_channels=1, out_channels=1, channels=(16,32,64,128),
strides=(2,2,2), num_res_units=2, norm=Norm.BATCH)``
(/root/reference/code/GAN/GAN_final.py:100-114). MONAI 0.4.0 builds that
recursively:

    block(inc, outc, channels, strides, is_top):
        c, s = channels[0], strides[0]
        down = ResidualUnit(inc -> c, stride s, subunits=num_res_units)
        if len(channels) > 2:
            sub  = block(c, c, channels[1:], strides[1:], is_top=False)
            upc  = 2 * c                       # skip-cat of down-out and sub-out
        else:
            sub  = ResidualUnit(c -> channels[-1], stride 1)   # bottom layer
            upc  = c + channels[-1]
        up   = ConvTranspose(upc -> outc, k=3, s, p=1, op=s-1) + BN + PReLU
               [+ ResidualUnit(outc -> outc, stride 1, subunits=1,
                               last_conv_only=is_top)]
        return down |> cat(identity, sub) |> up

where ResidualUnit(in->out, stride s, subunits m) is
  conv path: [Conv(k3, stride s then 1, pad same) + BN + PReLU] x m
             (the final BN+PReLU dropped when last_conv_only)
  residual : Conv(k3, stride s, pad 1) when s!=1 or in!=out;
             Conv(k1) when s==1 and in!=out; identity otherwise
and every Convolution is conv -> BatchNorm -> PReLU (MONAI 0.4.0 ordering,
act=PRELU single-shared-slope, norm=BATCH here).

This module reimplements that wiring natively in JAX/flax with channels-last
layout. `tests/test_torch_parity.py` checks numerics against a torch
re-implementation of the same topology layer by layer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm3d, Conv3d, ConvTranspose3d, PReLU


def _same_pad(kernel_size: int) -> int:
    return (kernel_size - 1) // 2


class Convolution(nn.Module):
    """MONAI 0.4.0 `Convolution`: conv (or conv-transpose) -> BN -> PReLU.

    `conv_only=True` drops norm+act (used for the UNet output layer).
    `norm=None` drops only the BatchNorm (MONAI ADN with norm=None — the
    reference's MONAI Discriminator uses this, perceptual_test.py:138).
    `dropout>0` inserts nn.Dropout between norm and act — MONAI's ADN
    ordering "NDA" (norm, dropout, act); requires an apply-time
    `rngs={"dropout": ...}` when train=True.
    """

    features: int
    strides: int = 1
    kernel_size: int = 3
    conv_only: bool = False
    is_transposed: bool = False
    norm: Optional[str] = "batch"
    dropout: float = 0.0
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = _same_pad(self.kernel_size)
        if self.is_transposed:
            x = ConvTranspose3d(
                self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=p,
                output_padding=self.strides - 1,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = Conv3d(
                self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=p,
                dtype=self.dtype,
                name="conv",
            )(x)
        if not self.conv_only:
            if self.norm is not None:
                x = BatchNorm3d(axis_name=self.bn_axis_name, name="norm")(x, train)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, name="drop")(
                    x, deterministic=not train)
            x = PReLU(name="act")(x)
        return x


class ResidualUnit(nn.Module):
    """MONAI 0.4.0 `ResidualUnit` (see module docstring)."""

    features: int
    strides: int = 1
    kernel_size: int = 3
    subunits: int = 2
    last_conv_only: bool = False
    norm: Optional[str] = "batch"
    dropout: float = 0.0
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        y = x
        s = self.strides
        subunits = max(1, self.subunits)
        for su in range(subunits):
            conv_only = self.last_conv_only and su == subunits - 1
            y = Convolution(
                self.features,
                strides=s,
                kernel_size=self.kernel_size,
                conv_only=conv_only,
                norm=self.norm,
                dropout=self.dropout,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name=f"unit{su}",
            )(y, train)
            s = 1
        if self.strides != 1 or in_ch != self.features:
            rk = self.kernel_size if self.strides != 1 else 1
            res = Conv3d(
                self.features,
                kernel_size=rk,
                strides=self.strides,
                padding=_same_pad(rk),
                dtype=self.dtype,
                name="residual",
            )(x)
        else:
            res = x
        return y + res


class _UNetLevel(nn.Module):
    """One recursion level: down -> skip-cat(sub) -> up."""

    out_channels: int
    channels: Tuple[int, ...]
    strides: Tuple[int, ...]
    num_res_units: int
    kernel_size: int
    up_kernel_size: int
    is_top: bool
    norm: Optional[str] = "batch"
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = self.channels[0]
        s = self.strides[0]
        common = dict(norm=self.norm, bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype)
        if self.num_res_units > 0:
            down = ResidualUnit(
                c, strides=s, kernel_size=self.kernel_size,
                subunits=self.num_res_units, name="down", **common,
            )
        else:
            down = Convolution(
                c, strides=s, kernel_size=self.kernel_size, name="down", **common
            )
        x = down(x, train)

        if len(self.channels) > 2:
            sub = _UNetLevel(
                out_channels=c,
                channels=self.channels[1:],
                strides=self.strides[1:],
                num_res_units=self.num_res_units,
                kernel_size=self.kernel_size,
                up_kernel_size=self.up_kernel_size,
                is_top=False,
                name="sub",
                **common,
            )
        else:
            # bottom layer: _get_down_layer(c, channels[-1], stride 1, False)
            if self.num_res_units > 0:
                sub = ResidualUnit(
                    self.channels[-1], strides=1, kernel_size=self.kernel_size,
                    subunits=self.num_res_units, name="sub", **common,
                )
            else:
                sub = Convolution(
                    self.channels[-1], strides=1, kernel_size=self.kernel_size,
                    name="sub", **common,
                )
        y = sub(x, train)
        x = jnp.concatenate([x, y], axis=-1)  # SkipConnection (cat mode)

        x = Convolution(
            self.out_channels,
            strides=s,
            kernel_size=self.up_kernel_size,
            conv_only=self.is_top and self.num_res_units == 0,
            is_transposed=True,
            name="up",
            **common,
        )(x, train)
        if self.num_res_units > 0:
            x = ResidualUnit(
                self.out_channels,
                strides=1,
                kernel_size=self.kernel_size,
                subunits=1,
                last_conv_only=self.is_top,
                name="up_ru",
                **common,
            )(x, train)
        return x


class UNet3D(nn.Module):
    """MONAI-0.4.0-compatible 3D U-Net (see module docstring for wiring).

    Input/output: NDHWC. Spatial dims must be divisible by prod(strides).
    """

    out_channels: int = 1
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (2, 2, 2)
    num_res_units: int = 2
    kernel_size: int = 3
    up_kernel_size: int = 3
    # norm="batch" is the reference topology; norm=None builds the SAME
    # wiring without BatchNorm layers — the target of eval-time BN folding
    # (models/fold.py), where running stats are folded into conv weights.
    norm: Optional[str] = "batch"
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert len(self.channels) >= 2, "channels must have >= 2 entries"
        # MONAI 0.4.0 silently ignores surplus strides — the reference's
        # 4-block variant passes strides=(2,2,2,2) with 4 channels
        # (test_runs/GAN.py:107-108); reproduce that tolerance.
        strides = tuple(self.strides)[: len(self.channels) - 1]
        assert len(strides) == len(self.channels) - 1, (
            f"need {len(self.channels) - 1} strides, got {len(self.strides)}"
        )
        total = 1
        for s in strides:
            total *= s
        for d in x.shape[1:4]:
            if d % total != 0:
                raise ValueError(
                    f"UNet3D input spatial dims {x.shape[1:4]} must be divisible "
                    f"by prod(strides)={total} so the up path restores the input "
                    f"shape (e.g. pad/resample to a multiple of {total})."
                )
        return _UNetLevel(
            out_channels=self.out_channels,
            channels=tuple(self.channels),
            strides=strides,
            num_res_units=self.num_res_units,
            kernel_size=self.kernel_size,
            up_kernel_size=self.up_kernel_size,
            is_top=True,
            norm=self.norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="model",
        )(x, train)
