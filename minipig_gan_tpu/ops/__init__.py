"""On-device compute ops: resampling, normalization, patches, metrics."""

from .metrics import (
    evaluation_suite,
    mae,
    mse,
    mutual_information,
    psnr,
    ssim3d,
)
from .patches import extract_patches, random_patch_pairs, sample_patch_corners
from .percentile import (
    approx_percentile_window,
    percentile_window,
    rescale_to_uint8_range,
    scale_intensity_range,
    scale_intensity_range_percentiles,
)
from .resample import (
    GridSpec,
    human_canonical_grid,
    minipig_native_grid,
    resample,
    resample_affine,
    separable_resample,
    trilinear_gather,
)

__all__ = [
    "extract_patches",
    "random_patch_pairs",
    "sample_patch_corners",
    "GridSpec",
    "human_canonical_grid",
    "minipig_native_grid",
    "resample",
    "resample_affine",
    "separable_resample",
    "trilinear_gather",
    "percentile_window",
    "approx_percentile_window",
    "scale_intensity_range",
    "scale_intensity_range_percentiles",
    "rescale_to_uint8_range",
    "mae",
    "mse",
    "psnr",
    "ssim3d",
    "mutual_information",
    "evaluation_suite",
]
