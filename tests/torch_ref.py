"""Torch mirror of the MONAI-0.4.0 UNet topology + reference discriminators.

This is an independent PyTorch re-implementation of the layer wiring the
reference relies on (MONAI 0.4.0 `UNet`, see minipig_gan_tpu/models/unet3d.py
docstring for the recursion), used ONLY as a numerical oracle in
tests/test_torch_parity.py: we load identical weights into the torch mirror
and the JAX models and require matching outputs. That pins down torch-vs-XLA
conv/transposed-conv/batchnorm semantics (padding rules, output_padding,
biased/unbiased variance, PReLU sharing) without depending on monai/cuda.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


def same_pad(k: int) -> int:
    return (k - 1) // 2


class Convolution(nn.Sequential):
    """MONAI 0.4.0 Convolution: conv[/transpose] -> BN -> Dropout -> PReLU
    (ADN ordering "NDA"; unless conv_only). norm=None drops just the BN
    (ADN skips None entries); dropout=0 skips the Dropout."""

    def __init__(self, in_ch, out_ch, strides=1, kernel_size=3, conv_only=False,
                 is_transposed=False, norm="batch", dropout=0.0):
        super().__init__()
        p = same_pad(kernel_size)
        if is_transposed:
            conv = nn.ConvTranspose3d(
                in_ch, out_ch, kernel_size, strides, p, output_padding=strides - 1
            )
        else:
            conv = nn.Conv3d(in_ch, out_ch, kernel_size, strides, p)
        self.add_module("conv", conv)
        if not conv_only:
            if norm is not None:
                self.add_module("norm", nn.BatchNorm3d(out_ch))
            if dropout > 0:
                self.add_module("drop", nn.Dropout(dropout))
            self.add_module("act", nn.PReLU())


class ResidualUnit(nn.Module):
    def __init__(self, in_ch, out_ch, strides=1, kernel_size=3, subunits=2,
                 last_conv_only=False, norm="batch", dropout=0.0):
        super().__init__()
        self.conv = nn.Sequential()
        self.residual = nn.Identity()
        sch, sstr = in_ch, strides
        subunits = max(1, subunits)
        for su in range(subunits):
            conv_only = last_conv_only and su == subunits - 1
            self.conv.add_module(
                f"unit{su}",
                Convolution(sch, out_ch, strides=sstr, kernel_size=kernel_size,
                            conv_only=conv_only, norm=norm, dropout=dropout),
            )
            sch, sstr = out_ch, 1
        if strides != 1 or in_ch != out_ch:
            rk = kernel_size if strides != 1 else 1
            self.residual = nn.Conv3d(in_ch, out_ch, rk, strides, same_pad(rk))

    def forward(self, x):
        return self.conv(x) + self.residual(x)


class SkipConnection(nn.Module):
    def __init__(self, submodule):
        super().__init__()
        self.submodule = submodule

    def forward(self, x):
        return torch.cat([x, self.submodule(x)], dim=1)


class UNet(nn.Module):
    """MONAI 0.4.0 UNet wiring (channels/strides/num_res_units/norm=BATCH)."""

    def __init__(self, in_channels=1, out_channels=1, channels=(16, 32, 64, 128),
                 strides=(2, 2, 2), num_res_units=2, kernel_size=3, up_kernel_size=3):
        super().__init__()
        self.num_res_units = num_res_units
        self.kernel_size = kernel_size
        self.up_kernel_size = up_kernel_size

        def down_layer(inc, outc, s, is_top):
            if num_res_units > 0:
                return ResidualUnit(inc, outc, strides=s, kernel_size=kernel_size,
                                    subunits=num_res_units)
            return Convolution(inc, outc, strides=s, kernel_size=kernel_size)

        def up_layer(inc, outc, s, is_top):
            conv = Convolution(
                inc, outc, strides=s, kernel_size=up_kernel_size,
                conv_only=is_top and num_res_units == 0, is_transposed=True,
            )
            if num_res_units > 0:
                ru = ResidualUnit(outc, outc, strides=1, kernel_size=kernel_size,
                                  subunits=1, last_conv_only=is_top)
                return nn.Sequential(conv, ru)
            return conv

        def create_block(inc, outc, channels, strides, is_top):
            c, s = channels[0], strides[0]
            if len(channels) > 2:
                sub = create_block(c, c, channels[1:], strides[1:], False)
                upc = c * 2
            else:
                sub = down_layer(c, channels[1], 1, False)
                upc = c + channels[1]
            return nn.Sequential(
                down_layer(inc, c, s, is_top),
                SkipConnection(sub),
                up_layer(upc, outc, s, is_top),
            )

        self.model = create_block(in_channels, out_channels, list(channels),
                                  list(strides), True)

    def forward(self, x):
        return self.model(x)


class CasNetGenerator(nn.Module):
    """GAN_final.py:92-122 mirror."""

    def __init__(self, n_unet_blocks=6, channels=(16, 32, 64, 128), strides=(2, 2, 2)):
        super().__init__()
        blocks = [UNet(1, 1, channels, strides, num_res_units=2)
                  for _ in range(n_unet_blocks)]
        blocks.append(nn.Tanh())
        self.model = nn.Sequential(*blocks)

    def forward(self, x):
        return self.model(x)


class GlobalDiscriminator(nn.Module):
    """GAN_final.py:159-209 mirror, with DHWC-ordered flatten so the head
    weights map 1:1 onto the channels-last JAX model."""

    def __init__(self, in_spatial=128, features=(64, 128, 256, 256)):
        super().__init__()
        f = features
        self.model_conv = nn.Sequential(
            nn.Conv3d(1, f[0], 3, 1), nn.BatchNorm3d(f[0]), nn.LeakyReLU(0.2),
            nn.Conv3d(f[0], f[1], 3, 1), nn.BatchNorm3d(f[1]), nn.LeakyReLU(0.2),
            nn.Conv3d(f[1], f[2], 4, 2), nn.BatchNorm3d(f[2]), nn.LeakyReLU(0.2),
            nn.Conv3d(f[2], f[3], 4, 2), nn.BatchNorm3d(f[3]), nn.LeakyReLU(0.2),
        )
        sp = in_spatial - 2 - 2
        sp = (sp - 4) // 2 + 1
        sp = (sp - 4) // 2 + 1
        self.head = nn.Linear(f[3] * sp ** 3, 1)

    def forward(self, x):
        out = self.model_conv(x)
        out = out.permute(0, 2, 3, 4, 1).reshape(out.shape[0], -1)  # DHWC order
        return self.head(out)  # logits


class PatchPerceptualDiscriminator(nn.Module):
    """test_runs/GAN.py:136-198 mirror (DHWC flatten, logits out)."""

    def __init__(self, features=(64, 128, 256, 512), hidden=64, patch=16):
        super().__init__()
        f = features
        chans = [1] + list(f)
        self.model_conv = nn.ModuleList()
        for i in range(len(f)):
            self.model_conv.extend([
                nn.Conv3d(chans[i], chans[i + 1], 3, 1),
                nn.BatchNorm3d(chans[i + 1]),
                nn.LeakyReLU(0.2),
            ])
        sp = patch - 2 * len(f)
        self.fc0 = nn.Linear(f[-1] * sp ** 3, hidden)
        self.fc1 = nn.Linear(hidden, 1)

    def forward(self, x):
        acts = []
        for m in self.model_conv:
            x = m(x)
            acts.append(x.clone())
        x = x.permute(0, 2, 3, 4, 1).reshape(x.shape[0], -1)
        acts.append(x.clone())
        x = self.fc0(x)
        acts.append(x.clone())
        logits = self.fc1(x)
        acts.append(logits.clone())
        acts.append(torch.sigmoid(logits))
        return logits, acts


class MonaiDiscriminator(nn.Module):
    """Mirror of the reference's MONAI 0.4.0 Discriminator config
    (perceptual_test.py:127-141): per channel entry one
    ResidualUnit(subunits=2, norm=None, act=PRELU, last_conv_only=is_last,
    dropout=0.25 — the 0.4.0 Discriminator default the reference does not
    override, docs/AUDIT_MONAI_040.md §5), all strides 2, then Flatten ->
    Linear(prod -> 1) (DHWC-ordered flatten to map 1:1 onto the
    channels-last JAX head). Returns logits. Eval mode is deterministic;
    train() engages the nn.Dropout layers (conv -> Dropout -> PReLU, ADN
    "NDA" with norm=None) for the statistical train-mode parity check in
    test_torch_parity.py."""

    def __init__(self, channels=(8, 16, 32, 64, 128, 256, 1),
                 strides=(2, 2, 2, 2, 2, 2, 2, 1), num_res_units=2,
                 kernel_size=3, in_spatial=32, dropout=0.25):
        super().__init__()
        self.net = nn.Sequential()
        in_ch, size = 1, in_spatial
        pairs = list(zip(channels, strides))
        for i, (c, s) in enumerate(pairs):
            self.net.add_module(
                f"layer{i}",
                ResidualUnit(in_ch, c, strides=s, kernel_size=kernel_size,
                             subunits=num_res_units,
                             last_conv_only=i == len(pairs) - 1, norm=None,
                             dropout=dropout),
            )
            in_ch = c
            size = (size + 2 * same_pad(kernel_size) - kernel_size) // s + 1
        self.head = nn.Linear(in_ch * size ** 3, 1)

    def forward(self, x):
        x = self.net(x)
        x = x.permute(0, 2, 3, 4, 1).reshape(x.shape[0], -1)
        return self.head(x)


# ----------------------------------------------------------------------------
# Weight transplant: flax param tree -> this torch mirror.
# ----------------------------------------------------------------------------

def _np(x):
    return np.asarray(x)


def copy_conv(tm: nn.Conv3d, p: dict):
    tm.weight.data = torch.from_numpy(_np(p["kernel"]).transpose(4, 3, 0, 1, 2).copy())
    if "bias" in p:
        tm.bias.data = torch.from_numpy(_np(p["bias"]).copy())


def copy_convtranspose(tm: nn.ConvTranspose3d, p: dict):
    # flax kernel layout (D,H,W,out,in) -> torch (in,out,D,H,W)
    tm.weight.data = torch.from_numpy(_np(p["kernel"]).transpose(4, 3, 0, 1, 2).copy())
    if "bias" in p:
        tm.bias.data = torch.from_numpy(_np(p["bias"]).copy())


def copy_bn(tm: nn.BatchNorm3d, p: dict, stats: dict | None = None):
    tm.weight.data = torch.from_numpy(_np(p["scale"]).copy())
    tm.bias.data = torch.from_numpy(_np(p["bias"]).copy())
    if stats is not None:
        tm.running_mean.data = torch.from_numpy(_np(stats["mean"]).copy())
        tm.running_var.data = torch.from_numpy(_np(stats["var"]).copy())


def copy_prelu(tm: nn.PReLU, p: dict):
    tm.weight.data = torch.from_numpy(_np(p["alpha"]).copy())


def copy_dense(tm: nn.Linear, p: dict):
    tm.weight.data = torch.from_numpy(_np(p["kernel"]).T.copy())
    if "bias" in p:
        tm.bias.data = torch.from_numpy(_np(p["bias"]).copy())


def copy_convolution(tm: Convolution, p: dict, stats: dict | None, transposed: bool):
    if transposed:
        copy_convtranspose(tm.conv, p["conv"])
    else:
        copy_conv(tm.conv, p["conv"])
    if hasattr(tm, "norm"):
        copy_bn(tm.norm, p["norm"], stats.get("norm") if stats else None)
    if hasattr(tm, "act"):
        copy_prelu(tm.act, p["act"])


def copy_residual_unit(tm: ResidualUnit, p: dict, stats: dict | None):
    for name, sub in tm.conv.named_children():
        copy_convolution(sub, p[name], stats.get(name) if stats else None, False)
    if isinstance(tm.residual, nn.Conv3d):
        copy_conv(tm.residual, p["residual"])


def copy_unet_level(tseq: nn.Sequential, p: dict, stats: dict | None, num_res_units: int):
    down, skip, up = tseq[0], tseq[1], tseq[2]
    s = stats or {}
    if isinstance(down, ResidualUnit):
        copy_residual_unit(down, p["down"], s.get("down"))
    else:
        copy_convolution(down, p["down"], s.get("down"), False)
    sub = skip.submodule
    if isinstance(sub, nn.Sequential):  # deeper level
        copy_unet_level(sub, p["sub"], s.get("sub"), num_res_units)
    elif isinstance(sub, ResidualUnit):
        copy_residual_unit(sub, p["sub"], s.get("sub"))
    else:
        copy_convolution(sub, p["sub"], s.get("sub"), False)
    if num_res_units > 0:
        copy_convolution(up[0], p["up"], s.get("up"), True)
        copy_residual_unit(up[1], p["up_ru"], s.get("up_ru"))
    else:
        copy_convolution(up, p["up"], s.get("up"), True)


def copy_unet(tm: UNet, params: dict, stats: dict | None = None):
    copy_unet_level(tm.model, params["model"], (stats or {}).get("model"),
                    tm.num_res_units)


def copy_global_discriminator(tm: GlobalDiscriminator, params: dict,
                              stats: dict | None = None):
    s = stats or {}
    convs = [tm.model_conv[i] for i in (0, 3, 6, 9)]
    bns = [tm.model_conv[i] for i in (1, 4, 7, 10)]
    for i in range(4):
        blk = params[f"block{i}"]
        sblk = (s.get(f"block{i}") or {})
        copy_conv(convs[i], blk["conv"])
        copy_bn(bns[i], blk["norm"], sblk.get("norm"))
    copy_dense(tm.head, params["head"])


def copy_monai_discriminator(tm: MonaiDiscriminator, params: dict):
    for i, (_, layer) in enumerate(tm.net.named_children()):
        copy_residual_unit(layer, params[f"layer{i}"], None)
    copy_dense(tm.head, params["head"])


def copy_patch_discriminator(tm: PatchPerceptualDiscriminator, params: dict,
                             stats: dict | None = None):
    s = stats or {}
    for i in range(4):
        copy_conv(tm.model_conv[3 * i], params[f"conv{i}"])
        copy_bn(tm.model_conv[3 * i + 1], params[f"norm{i}"], s.get(f"norm{i}"))
    copy_dense(tm.fc0, params["fc0"])
    copy_dense(tm.fc1, params["fc1"])
