"""Pallas TPU kernels for the framework's hot non-matmul ops."""

from .patches_kernel import extract_patches_pallas
from .resample_kernel import separable_resample_pallas

__all__ = ["extract_patches_pallas", "separable_resample_pallas"]
