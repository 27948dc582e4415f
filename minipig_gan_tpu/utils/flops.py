"""Analytic FLOP accounting for the reference architectures.

XLA's `compiled.cost_analysis()` counts a `lax.scan` body ONCE, not
`length` times — with the CasNet expressed as a 6-block scan and gradient
accumulation as an accum-step scan, the reported step FLOPs under-count by
up to 12x and the bench's MFU with them. These functions walk the actual
layer geometry (the same recursion as models/unet3d.py / the reference
MONAI 0.4.0 UNet, GAN_final.py:100-119) and count conv/dense MACs exactly.

Convention: 1 MAC = 2 FLOPs; elementwise/BN/reduction FLOPs are ignored
(<1% of a conv net's arithmetic). Backward-pass cost uses the standard
decomposition: dgrad ≈ 1x fwd, wgrad ≈ 1x fwd per conv => bwd ≈ 2x fwd.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from ..config import Config


def _conv_flops(out_spatial: Sequence[int], cin: int, cout: int,
                k: int = 3) -> float:
    vox = 1.0
    for s in out_spatial:
        vox *= s
    return 2.0 * vox * cin * cout * (k ** 3)


def unet3d_fwd_flops(spatial: Sequence[int], channels: Sequence[int],
                     strides: Sequence[int], num_res_units: int = 2,
                     in_ch: int = 1, out_ch: int = 1,
                     kernel: int = 3) -> float:
    """One MONAI-0.4.0-topology UNet forward (models/unet3d.py wiring)."""

    def down(sp, cin, cout, stride):
        so = [d // stride for d in sp]
        f = _conv_flops(so, cin, cout, kernel)          # unit0 (stride s)
        for _ in range(max(1, num_res_units) - 1):      # unit1.. (stride 1)
            f += _conv_flops(so, cout, cout, kernel)
        if stride != 1 or cin != cout:                  # residual conv
            rk = kernel if stride != 1 else 1
            f += _conv_flops(so, cin, cout, rk)
        return f, so

    def up(sp_in, cin, cout, stride, is_top):
        so = [d * stride for d in sp_in]
        # ConvTranspose cost == conv with same kernel over the INPUT grid
        # times cout... counted on output voxels / stride^3 == input voxels:
        f = 2.0 * float(sp_in[0] * sp_in[1] * sp_in[2]) * cin * cout * kernel**3
        if num_res_units > 0:                           # up_ru, subunits=1
            f += _conv_flops(so, cout, cout, kernel)
        return f, so

    def level(sp, cin, cout, chs, sts, is_top):
        c, s = chs[0], sts[0]
        f, sp_d = down(sp, cin, c, s)
        if len(chs) > 2:
            f_sub, _ = level(sp_d, c, c, chs[1:], sts[1:], False)
            sub_out_ch = c
        else:
            f_sub, _ = down(sp_d, c, chs[-1], 1)        # bottom layer
            sub_out_ch = chs[-1]
        f += f_sub
        f_up, _ = up(sp_d, c + sub_out_ch, cout, s, is_top)
        return f + f_up, sp

    total, _ = level(list(spatial), in_ch, out_ch,
                     list(channels), list(strides), True)
    return total


def casnet_fwd_flops(spatial: Sequence[int], n_blocks: int = 6,
                     channels: Sequence[int] = (16, 32, 64, 128),
                     strides: Sequence[int] = (2, 2, 2),
                     num_res_units: int = 2) -> float:
    return n_blocks * unet3d_fwd_flops(spatial, channels, strides,
                                       num_res_units)


def global_disc_fwd_flops(spatial: Sequence[int],
                          features: Sequence[int] = (64, 128, 256, 256)
                          ) -> float:
    """GlobalDiscriminator (GAN_final.py:159-209): VALID convs
    k3s1, k3s1, k4s2, k4s2 + Dense head."""
    specs = [(features[0], 3, 1), (features[1], 3, 1),
             (features[2], 4, 2), (features[3], 4, 2)]
    sp = list(spatial)
    cin = 1
    f = 0.0
    for cout, k, s in specs:
        sp = [(d - k) // s + 1 for d in sp]
        f += _conv_flops(sp, cin, cout, k)
        cin = cout
    head_in = cin * sp[0] * sp[1] * sp[2]
    f += 2.0 * head_in  # Dense(head_in -> 1)
    return f


def gan_step_flops(cfg: Config, batch_size: int,
                   spatial: Tuple[int, int, int]) -> float:
    """Analytic FLOPs of one full alternating train step (train/gan.py).

    Composition per volume (reuse_g_forward on):
      G substep: G fwd + D fwd(gen) + D dgrad + G bwd (2x G fwd)
      D substep: 2x D fwd + 2x D wgrad
    Strict semantics adds one more G fwd in the D substep.
    """
    g = cfg.generator
    fg = unet3d_fwd_flops(spatial, g.channels, g.strides,
                          g.num_res_units) * g.n_unet_blocks
    mode = cfg.train.mode
    if mode == "generator_only":
        per_vol = 3.0 * fg
        return per_vol * batch_size
    if mode == "patch":
        # patch D runs on roi-size crops x num_samples
        roi = tuple(cfg.patch.roi_size)
        n = cfg.patch.num_samples
        fd = _patch_disc_fwd_flops(roi, cfg.discriminator.patch_features,
                                   cfg.discriminator.patch_hidden) * n
    else:
        fd = global_disc_fwd_flops(spatial, cfg.discriminator.features)
    g_sub = fg + fd + fd + 2.0 * fg          # fwd + D fwd + D dgrad + G bwd
    d_sub = 2.0 * fd + 2.0 * fd              # 2 fwd + 2 wgrad
    if not cfg.train.reuse_g_forward:
        d_sub += fg
    elif cfg.train.fused_step and mode == "gan":
        # the fused joint-loss step's two fake-pass forwards are CSE'd into
        # one executed D forward (train/gan.py::_fused_train_step)
        d_sub -= fd
    if mode == "patch" and cfg.discriminator.use_perceptual:
        g_sub += fd                           # extra D fwd on real patches
    return (g_sub + d_sub) * batch_size


def _patch_disc_fwd_flops(roi: Sequence[int],
                          features: Sequence[int] = (64, 128, 256, 512),
                          hidden: int = 64) -> float:
    """PatchPerceptualDiscriminator: 4x conv k3 s1 VALID + 2 dense."""
    sp = list(roi)
    cin = 1
    f = 0.0
    for cout in features:
        sp = [d - 2 for d in sp]
        f += _conv_flops(sp, cin, cout, 3)
        cin = cout
    flat = cin * sp[0] * sp[1] * sp[2]
    f += 2.0 * flat * hidden + 2.0 * hidden * 1.0
    return f
