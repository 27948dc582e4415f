"""CasNet generator: a cascade of 3D U-Nets ending in tanh (MedGAN).

Reference: `CasNetGenerator` at /root/reference/code/GAN/GAN_final.py:92-122 —
6 MONAI UNet(channels=(16,32,64,128), strides=(2,2,2), num_res_units=2,
norm=BATCH) blocks chained 1-channel -> 1-channel, followed by nn.Tanh.
Variants in the reference experiments:
  * test_runs/GAN.py:94-129   — 4 blocks, channels (32,64,128,256), strides (2,2,2,2)
  * test_runs/generator_test.py:47-77 — 6 blocks, 7-level channels (64..512)
  * test_runs/perceptual_test.py:90-120 — 3 blocks

TPU-native design choices:
  * The U-Net blocks all share one topology, so the cascade is expressed as
    `nn.scan` over stacked per-block parameters — one traced/compiled block
    body instead of six, cutting XLA compile time and HLO size ~6x.
  * `remat=True` wraps each block in `nn.remat` (rematerialization): only the
    1-channel 128^3 block boundaries are kept live for the backward pass, so
    activation memory is ~6x smaller at the cost of one extra forward — the
    standard HBM-vs-FLOPs trade on TPU. Measured on the v5e chip, the
    canonical batch-4/accum-2 step FITS in HBM without explicit remat (XLA's
    scheduler handles it) and runs ~5% faster, so the config default is
    remat=False (tpu_tests/remat_experiments.py); enable it for configs whose
    activations genuinely exceed HBM.
  * `use_scan=False` falls back to a plain python loop of independently-named
    blocks (useful for per-block checkpoint surgery / debugging).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet3d import UNet3D


class CasNetGenerator(nn.Module):
    """Cascade of `n_unet_blocks` U-Nets + tanh. NDHWC in/out, 1 channel."""

    n_unet_blocks: int = 6
    out_channels: int = 1
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (2, 2, 2)
    num_res_units: int = 2
    use_scan: bool = True
    remat: bool = True
    # None = BN-free wiring for eval-time folded weights (models/fold.py)
    norm: Optional[str] = "batch"
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.dtype is not None:
            # keep the scan carry dtype stable (blocks emit self.dtype)
            x = x.astype(self.dtype)
        unet_kwargs = dict(
            out_channels=self.out_channels,
            channels=self.channels,
            strides=self.strides,
            num_res_units=self.num_res_units,
            norm=self.norm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )
        if self.use_scan:
            class _Block(nn.Module):
                @nn.compact
                def __call__(self, carry, _):
                    y = UNet3D(**unet_kwargs, name="unet")(carry, train)
                    return y, None

            block_cls = _Block
            if self.remat:
                block_cls = nn.remat(
                    block_cls,
                    prevent_cse=False,
                    static_argnums=(),
                )
            scan = nn.scan(
                block_cls,
                variable_axes={"params": 0, "batch_stats": 0},
                variable_broadcast=False,
                split_rngs={"params": True},
                length=self.n_unet_blocks,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            x, _ = scan(name="blocks")(x, None)
        else:
            unet_cls = (
                nn.remat(UNet3D, prevent_cse=False, static_argnums=(2,))
                if self.remat
                else UNet3D
            )
            for i in range(self.n_unet_blocks):
                x = unet_cls(**unet_kwargs, name=f"block{i}")(x, train)
        return jnp.tanh(x.astype(jnp.float32)).astype(x.dtype)
