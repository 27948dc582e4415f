"""minipig_gan_tpu — TPU-native cross-modality MRI GAN framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
mbrzus/Cross-Modality-Minipig-Gan (reference mounted at /root/reference):
3D conditional-GAN T1w -> T2w MRI translation with cross-species (minipig)
transfer, preprocessing, training, inference, and evaluation.

Subpackages
-----------
models    CasNet generator (cascade of MONAI-0.4.0-topology 3D U-Nets) and
          global / patch-perceptual discriminators, channels-last, bf16-ready.
ops       On-device compute: trilinear physical-space resampling, percentile
          intensity normalization, random patch extraction, image metrics
          (MAE/MSE/PSNR/SSIM/MI), Pallas kernels.
data      NIfTI-1 codec (numpy + native C++), structure.json split schema and
          generator, host pipeline with async prefetch.
parallel  Device-mesh construction and sharding rules (data/spatial axes).
train     Losses, the single-jit alternating GAN train step, train loop,
          checkpointing, logging.
eval      Inference CLIs (human test set, minipig transfer) and metric reports.
"""

__version__ = "0.1.0"
