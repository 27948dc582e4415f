"""Data layer: NIfTI codec, structure.json splits, synthetic fixtures,
host pipeline."""

from .nifti import ImageMeta, read_nifti, write_nifti
from .structure import (
    count_breakdown,
    generate_structure,
    load_structure,
    split_pairs,
    structure_to_pairs,
    write_structure,
)
from .synthetic import make_bids_dataset, synthetic_pair

__all__ = [
    "ImageMeta",
    "read_nifti",
    "write_nifti",
    "generate_structure",
    "load_structure",
    "structure_to_pairs",
    "split_pairs",
    "count_breakdown",
    "write_structure",
    "make_bids_dataset",
    "synthetic_pair",
]
