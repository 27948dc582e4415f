"""Model zoo: CasNet generator + discriminators (TPU-native, NDHWC)."""

from .casnet import CasNetGenerator
from .discriminator import (
    GlobalDiscriminator,
    MonaiDiscriminator,
    MonaiStyleDiscriminator,
    PatchPerceptualDiscriminator,
)
from .layers import (
    BatchNorm3d,
    Conv3d,
    ConvTranspose3d,
    Dense,
    PReLU,
    leaky_relu,
)
from .unet3d import Convolution, ResidualUnit, UNet3D

__all__ = [
    "CasNetGenerator",
    "GlobalDiscriminator",
    "MonaiDiscriminator",
    "MonaiStyleDiscriminator",
    "PatchPerceptualDiscriminator",
    "UNet3D",
    "Convolution",
    "ResidualUnit",
    "BatchNorm3d",
    "Conv3d",
    "ConvTranspose3d",
    "Dense",
    "PReLU",
    "leaky_relu",
]
