"""TPU-native 3D NN layer primitives with PyTorch-compatible semantics.

These are the building blocks for the CasNet generator and the discriminators
(reference: /root/reference/code/GAN/GAN_final.py:92-209). They are written
channels-last (NDHWC) — the TPU-native layout, which lets XLA tile convs onto
the MXU — while reproducing the *numerical semantics* of the torch layers the
reference uses (Conv3d, ConvTranspose3d, BatchNorm3d, PReLU, LeakyReLU,
Linear), including torch's default initializers so training dynamics match.

Parity notes (verified against torch in tests/test_torch_parity.py):
  * Conv3d:     torch kaiming_uniform(a=sqrt(5)) init == U(-1/sqrt(fan_in), +);
                bias U(-1/sqrt(fan_in), +). Explicit symmetric padding.
  * ConvTranspose3d(k, s, p, output_padding=op): implemented via
    lax.conv_general_dilated with lhs_dilation=s and per-side padding
    (k-1-p, k-1-p+op) on a spatially-flipped kernel (gradient-of-conv
    identity). Output size = (i-1)*s - 2p + k + op.
  * BatchNorm3d: eps=1e-5, momentum=0.1 (torch convention: new = (1-m)*old
    + m*batch), biased variance for normalization, unbiased for the running
    estimate. Optional `axis_name` syncs batch stats across the data mesh
    axis (cross-replica BN); default is per-replica stats, matching the
    reference's Lightning `accelerator='dp'` behavior (GAN_final.py:485).
  * PReLU: single shared learnable slope, init 0.25 (MONAI UNet default act).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

IntOr3 = Union[int, Tuple[int, int, int]]


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t  # type: ignore[return-value]


def torch_conv_kernel_init(fan_in: int) -> Callable:
    """torch's default kaiming_uniform_(a=sqrt(5)): U(-1/sqrt(fan_in), +)."""
    if fan_in <= 0:
        raise ValueError(
            "layer fan_in is 0 — the input has no features. For discriminators "
            "this usually means the patch/volume is too small for the conv "
            "stack (spatial size collapsed to 0 through the VALID convs)."
        )
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv3d(nn.Module):
    """3D convolution, NDHWC, torch-compatible init/padding semantics.

    `padding` is the symmetric per-side spatial padding (torch convention);
    padding=0 is VALID. Mirrors nn.Conv3d used at GAN_final.py:165-196.
    """

    features: int
    kernel_size: IntOr3 = 3
    strides: IntOr3 = 1
    padding: IntOr3 = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = _triple(self.padding)
        in_ch = x.shape[-1]
        fan_in = in_ch * k[0] * k[1] * k[2]
        # DHWIO kernel layout (spatial..., in, out) — XLA-native.
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init(fan_in),
            (*k, in_ch, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        # ops.fastconv schedules the backward convs behind an optimization
        # barrier (measured ~2x on in-step wgrads, BENCH_NOTES round-4);
        # forward numerics are the same conv_general_dilated either way.
        from ..ops import fastconv

        y = fastconv.conv3d(
            x.astype(dtype),
            kernel.astype(dtype),
            s,
            [(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class ConvTranspose3d(nn.Module):
    """3D transposed convolution matching torch ConvTranspose3d(k, s, p, op).

    Used by the MONAI-0.4.0 UNet up path (kernel 3, stride 2, same padding,
    output_padding = stride-1) — see models/unet3d.py. Implemented as the
    gradient-of-conv: dilate the input by `strides`, pad per side
    (k-1-p, k-1-p+op), convolve with the spatially flipped kernel.
    """

    features: int
    kernel_size: IntOr3 = 3
    strides: IntOr3 = 1
    padding: IntOr3 = 0
    output_padding: IntOr3 = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = _triple(self.padding)
        op = _triple(self.output_padding)
        in_ch = x.shape[-1]
        # torch ConvTranspose fan_in for init = out_channels? No: torch uses
        # weight shape (in_ch, out_ch, k,k,k) and kaiming on fan_in computed
        # from weight.size(1)*prod(k) = out_ch*prod(k)... torch _ConvTransposeNd
        # init uses init._calculate_fan_in_and_fan_out => fan_in = out_ch*prod(k)
        # because dim1 is out_channels for transposed. Reproduce that.
        fan_in = self.features * k[0] * k[1] * k[2]
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init(fan_in),
            (*k, self.features, in_ch),  # DHW, out, in — flipped IO on purpose
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        # flip spatial dims; treat as DHWIO with (in=in_ch, out=features)
        kt = jnp.flip(kernel, axis=(0, 1, 2))
        kt = jnp.swapaxes(kt, 3, 4)  # -> (D,H,W, in_ch, features)
        pads = [
            (k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(3)
        ]
        from ..ops import fastconv

        y = fastconv.conv_transpose3d(
            x.astype(dtype),
            kt.astype(dtype),
            s,
            pads,
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class BatchNorm3d(nn.Module):
    """BatchNorm over (N, D, H, W) per channel with torch semantics.

    Matches nn.BatchNorm3d(eps=1e-5, momentum=0.1): train mode normalizes by
    the biased batch variance and updates running stats with the unbiased
    variance; eval mode normalizes by running stats.

    `axis_name`, when set and inside a mapped/sharded context, computes batch
    statistics across that mesh axis (cross-replica sync-BN). The reference's
    `dp` training keeps per-GPU stats (GAN_final.py:485), so default is None.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (ch,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((ch,), self.param_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((ch,), self.param_dtype)
        )
        if train:
            red = tuple(range(x.ndim - 1))
            # fp32-ACCUMULATED reductions directly on the (possibly bf16)
            # input — no materialized fp32 copy of the activation, which
            # matters a lot on a bandwidth-bound chip (BN follows every conv).
            mean = jnp.mean(x, axis=red, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(x), axis=red, dtype=jnp.float32)
            n = 1
            for a in red:
                n *= x.shape[a]
            if self.axis_name is not None:
                try:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
                    n = n * jax.lax.axis_size(self.axis_name)
                except NameError:
                    pass  # not inside a mapped context; per-replica stats
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ).astype(self.param_dtype)
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                ).astype(self.param_dtype)
        else:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        # normalization arithmetic in the input dtype (per-channel affine is
        # precomputed in fp32 and cast once; elementwise pass stays bf16)
        inv = jax.lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        return y


class PReLU(nn.Module):
    """torch nn.PReLU() — one shared learnable slope, init 0.25.

    MONAI 0.4.0 UNet's default activation (Act.PRELU with no args).
    """

    init_value: float = 0.25
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param(
            "alpha",
            lambda key, shape, dtype: jnp.full(shape, self.init_value, dtype),
            (1,),
            self.param_dtype,
        )
        a = a.astype(x.dtype)
        # Identical values to torch's max(0,x)+a*min(0,x), but the where
        # form autodiffs to plain selects. The max/min form's vjp is JAX's
        # tie-splitting subgradient (eq-compare + divide chains at every
        # element) — measured 4x the backward time of this form on the
        # canonical CasNet step (tpu_tests/nonconv_budget.py: the
        # "act/min" fusions at ~10% of HBM peak). Gradients match torch
        # (x>0 ? g : a*g; ties at 0 take the a branch like torch's
        # input>0 test; d_alpha integrand x<=0 contributes g*x = 0 at 0).
        # A third form, (1+a)/2*x + (1-a)/2*|x| (select-free, sign-based
        # vjp, no pred tensor), measured WORSE on chip: fast step 2091 vs
        # 1986 ms — the materialized pred is 1 byte/elem while the abs
        # form's extra activation traffic is 2.
        return jnp.where(x > 0, x, a * x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """nn.LeakyReLU(0.2) as used in every discriminator block
    (GAN_final.py:171-189, test_runs/GAN.py:148-166)."""
    return jnp.where(x >= 0, x, negative_slope * x)


class Dense(nn.Module):
    """torch nn.Linear-compatible dense layer (y = x W^T + b, torch init)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init(in_f), (in_f, self.features), self.param_dtype
        )
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(in_f), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)
