"""Composable dict-style transforms — the framework's preprocessing API.

Mirrors the MONAI MapTransform surface the reference builds its pipelines
from (/root/reference/code/GAN/transforms.py, transforms2.py, and the Compose
at GAN_final.py:381-398): each transform is callable on a dict and returns a
new dict, geometry metadata travels in ``{key}_meta`` entries, and pipelines
compose with `Compose`. Users of the reference's transform stack will find
the same pieces here, ITK-free:

  reference                       here
  ---------------------------------------------------------------
  LoadITKImaged                   LoadNiftid          (transforms.py:5-19,
                                                       transforms2.py:9-28)
  UpdateMetaDatad                 (automatic: LoadNiftid stores ImageMeta)
  ITKImageToNumpyd / ToITKImaged  (no-ops here: volumes are numpy already;
                                   metadata stays in {key}_meta)
  ResampleT1T2d                   ResamplePaird       (transforms.py:79-213)
  MiniPigResampled                MinipigResampled    (transforms2.py:124-172)
  ScaleIntensityRangePercentilesd ScaleIntensityRangePercentilesd
  BinaryThresholdd                BinaryThresholdd    (transforms2.py:175-196)
  SaveITKImaged                   SaveNiftid          (transforms2.py:98-117)
  AddChanneld / ToTensord         AddChanneld / ToArrayd
  RandSpatialCropSamplesd         (on-device: ops/patches.py)
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.resample import (
    GridSpec,
    human_canonical_grid,
    minipig_native_grid,
    resample_numpy,
)
from .nifti import ImageMeta, read_nifti, write_nifti


class Transform:
    """Base: callable dict -> dict (shallow-copied, like MONAI MapTransform)."""

    keys: Sequence[str] = ()

    def __call__(self, data: Dict) -> Dict:
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, data: Dict) -> Dict:
        for t in self.transforms:
            data = t(data)
        return data


class LoadNiftid(Transform):
    """Path -> (z, y, x) float32 volume + {key}_meta ImageMeta (filename kept,
    like transforms2.py:15-27)."""

    def __init__(self, keys: Sequence[str]):
        self.keys = keys

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            vol, meta = read_nifti(d[k])
            meta.filename = str(d[k])
            d[k] = vol
            d[f"{k}_meta"] = meta
        return d


class ResamplePaird(Transform):
    """Both keys onto the human canonical grid (ResampleT1T2d semantics,
    transforms.py:140-184): identity direction, origin -size/2, spacing
    fov/size, trilinear, zero-pad."""

    def __init__(self, keys: Sequence[str], output_size=(128, 128, 128),
                 fov_mm: float = 256.0):
        self.keys = keys
        self.grid = human_canonical_grid(tuple(output_size), fov_mm)

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            d[k] = resample_numpy(d[k], d[f"{k}_meta"], self.grid)
            d[f"{k}_meta"] = self.grid.meta(
                getattr(d.get(f"{k}_meta"), "filename", "")
            )
        return d


class MinipigResampled(Transform):
    """Native-FOV grid resample (transforms2.py:148-172): keeps the image's
    own direction/extent; spacing = physical_size / output_size."""

    def __init__(self, keys: Sequence[str], output_size=(128, 128, 128)):
        self.keys = keys
        self.output_size = tuple(output_size)

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            meta = d[f"{k}_meta"]
            grid = minipig_native_grid(d[k].shape, meta, self.output_size)
            d[k] = resample_numpy(d[k], meta, grid)
            d[f"{k}_meta"] = grid.meta(getattr(meta, "filename", ""))
        return d


class Resized(Transform):
    """Pure shape resize (no physical-space reasoning) — the MONAI `Resized`
    used by the early experiment pipeline (test_runs/perceptual_test.py:
    333-353: LoadImaged + Resized instead of the physical resampler).
    Linear interpolation with align_corners=False semantics
    (c_in = (i_out + 0.5) * in/out - 0.5, edge-clamped)."""

    def __init__(self, keys: Sequence[str], spatial_size=(128, 128, 128)):
        self.keys = keys
        self.spatial_size = tuple(spatial_size)

    @staticmethod
    def _weights(n_out: int, n_in: int) -> np.ndarray:
        scale = n_in / n_out
        c = (np.arange(n_out) + 0.5) * scale - 0.5
        c = np.clip(c, 0, n_in - 1)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = c - lo
        w = np.zeros((n_out, n_in), np.float32)
        rows = np.arange(n_out)
        np.add.at(w, (rows, lo), 1.0 - frac)
        np.add.at(w, (rows, hi), frac)
        return w

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            vol = np.asarray(d[k], np.float32)
            wz = self._weights(self.spatial_size[0], vol.shape[0])
            wy = self._weights(self.spatial_size[1], vol.shape[1])
            wx = self._weights(self.spatial_size[2], vol.shape[2])
            v = np.einsum("ax,zyx->zya", wx, vol)
            v = np.einsum("by,zya->zba", wy, v)
            d[k] = np.einsum("cz,zba->cba", wz, v)
            meta = d.get(f"{k}_meta")
            if meta is not None:
                out_spacing = meta.spacing * (
                    np.asarray(vol.shape[::-1]) / np.asarray(self.spatial_size[::-1])
                )
                new_meta = meta.copy()
                new_meta.spacing = out_spacing
                d[f"{k}_meta"] = new_meta
        return d


class ScaleIntensityRangePercentilesd(Transform):
    """MONAI-parameter-compatible percentile windowing (GAN_final.py:386-394;
    eval variant inferrence.py:150-162)."""

    def __init__(self, keys: Sequence[str], lower: float, upper: float,
                 b_min: float, b_max: float, clip: bool = True,
                 relative: bool = False):
        assert not relative, "relative mode is not used by the reference"
        self.keys = keys
        self.lower, self.upper = lower, upper
        self.b_min, self.b_max = b_min, b_max
        self.clip = clip

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            v = np.asarray(d[k], np.float32)
            a_min = np.percentile(v, self.lower)
            a_max = np.percentile(v, self.upper)
            denom = (a_max - a_min) or 1.0
            out = (v - a_min) / denom * (self.b_max - self.b_min) + self.b_min
            if self.clip:
                out = np.clip(out, min(self.b_min, self.b_max),
                              max(self.b_min, self.b_max))
            d[k] = out.astype(np.float32)
        return d


class Lambdad(Transform):
    def __init__(self, keys: Sequence[str], func: Callable):
        self.keys = keys
        self.func = func

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            d[k] = self.func(d[k])
        return d


class AddChanneld(Transform):
    """(D, H, W) -> (D, H, W, 1) (channels-last; torch reference prepends)."""

    def __init__(self, keys: Sequence[str]):
        self.keys = keys

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            d[k] = np.asarray(d[k])[..., None]
        return d


class ToArrayd(Transform):
    """ToTensord equivalent: ensure contiguous float32 numpy (device transfer
    happens at batch time in the pipeline)."""

    def __init__(self, keys: Sequence[str]):
        self.keys = keys

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        for k in self.keys:
            d[k] = np.ascontiguousarray(d[k], np.float32)
        return d


class BinaryThresholdd(Transform):
    """itk.BinaryThresholdImageFilter equivalent (transforms2.py:175-196):
    >= threshold -> high, else low."""

    def __init__(self, keys: Sequence[str], low: float, high: float,
                 threshold_value: float):
        assert len(keys) == 1, "call on the label key only"
        self.keys = keys
        self.low, self.high = low, high
        self.threshold = threshold_value

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        k = self.keys[0]
        d[k] = np.where(np.asarray(d[k]) >= self.threshold, self.high,
                        self.low).astype(np.float32)
        return d


class SaveNiftid(Transform):
    """SaveITKImaged naming semantics (transforms2.py:98-117):
    {out_dir}/{basename}_{postfix}.{ext}, geometry from {key}_meta."""

    def __init__(self, keys: Sequence[str], out_dir, output_postfix: str = "inf",
                 dtype=np.float32):
        self.keys = keys
        self.out_dir = Path(out_dir)
        self.postfix = output_postfix
        # dtype=np.float16 reproduces the reference's half-precision save
        # path (ToITKImaged casts tensors to float16, transforms2.py:82-87;
        # ITK then stores float32 on disk — see data/nifti.py write_nifti)
        self.dtype = dtype

    def __call__(self, data: Dict) -> Dict:
        d = dict(data)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        for k in self.keys:
            meta: ImageMeta = d.get(f"{k}_meta") or ImageMeta(
                origin=np.zeros(3), spacing=np.ones(3), direction=np.eye(3))
            src = Path(meta.filename or f"{k}.nii.gz")
            base = src.name.split(".")[0]
            ext = ".".join(src.name.split(".")[-2:]) if src.name.endswith(".gz") \
                else src.name.split(".")[-1]
            out = self.out_dir / (f"{base}_{self.postfix}.{ext}" if self.postfix
                                  else f"{base}.{ext}")
            vol = np.asarray(d[k], np.float32)
            if vol.ndim == 5:
                vol = vol[0, ..., 0]
            elif vol.ndim == 4:
                vol = vol[..., 0]
            write_nifti(out, vol, meta, dtype=self.dtype)
            d[f"{k}_saved_path"] = str(out)
        return d
