"""NIfTI-1 reader/writer (numpy codec, zero third-party deps) with ITK-style
geometry semantics.

Replaces the reference's ITK C++ I/O (`itk.imread` at
/root/reference/code/GAN/transforms.py:15, `itk.imwrite` at
transforms2.py:114). Matching conventions:

  * Arrays are returned in (z, y, x) index order, mirroring
    `itk.array_from_image` (transforms.py:58).
  * Geometry (origin, spacing, 3x3 direction cosines) is expressed in ITK's
    LPS physical space: the NIfTI affine (RAS) has its first two rows negated
    on read, and the inverse on write. The physical mapping is
    `phys = direction @ diag(spacing) @ [i, j, k] + origin` with (i, j, k) the
    (x, y, z) voxel index — exactly what `UpdateMetaDatad` captures
    (transforms.py:30-44).
  * sform is preferred over qform over bare pixdim, like ITK's NiftiImageIO.
  * .nii and .nii.gz, little- or big-endian, scl_slope/scl_inter applied.

A native C++ fast path (zlib + header parse) can be plugged in via
data/native.py when throughput matters; this module is the reference
implementation and fallback.
"""

from __future__ import annotations

import dataclasses
import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


@dataclasses.dataclass
class ImageMeta:
    """ITK-style geometry: LPS origin/spacing/direction (transforms.py:30-44)."""

    origin: np.ndarray  # (3,)
    spacing: np.ndarray  # (3,)
    direction: np.ndarray  # (3, 3) column i = direction cosine of index axis i
    filename: str = ""

    def copy(self) -> "ImageMeta":
        return ImageMeta(
            origin=self.origin.copy(),
            spacing=self.spacing.copy(),
            direction=self.direction.copy(),
            filename=self.filename,
        )

    def physical_size(self, shape_zyx: Tuple[int, ...]) -> np.ndarray:
        """size_xyz * spacing (transforms2.py:156-158 formula)."""
        size_xyz = np.asarray(shape_zyx[::-1], np.float64)
        return size_xyz * self.spacing


def _quat_to_rotation(b: float, c: float, d: float, qfac: float) -> np.ndarray:
    a2 = 1.0 - (b * b + c * c + d * d)
    a = np.sqrt(max(a2, 0.0))
    r = np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * b * c - 2 * a * d, 2 * b * d + 2 * a * c],
            [2 * b * c + 2 * a * d, a * a + c * c - b * b - d * d, 2 * c * d - 2 * a * b],
            [2 * b * d - 2 * a * c, 2 * c * d + 2 * a * b, a * a + d * d - b * b - c * c],
        ]
    )
    r[:, 2] *= qfac
    return r


def _open_maybe_gzip(path: Path):
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def read_nifti(path) -> Tuple[np.ndarray, ImageMeta]:
    """Read .nii/.nii.gz -> (volume (z, y, x) float32, ImageMeta in LPS)."""
    path = Path(path)
    with _open_maybe_gzip(path) as f:
        hdr = f.read(348)
        if len(hdr) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
        endian = "<"
        if sizeof_hdr != 348:
            sizeof_hdr = struct.unpack(">i", hdr[0:4])[0]
            if sizeof_hdr != 348:
                raise ValueError(f"{path}: not a NIfTI-1 file")
            endian = ">"
        magic = hdr[344:348]
        if magic[:3] not in (b"n+1", b"ni1"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")

        dim = struct.unpack(endian + "8h", hdr[40:56])
        ndim = dim[0]
        if ndim < 3:
            shape_xyz = tuple(dim[1 : 1 + ndim]) + (1,) * (3 - ndim)
        else:
            shape_xyz = tuple(dim[1:4])
            extra = int(np.prod([d for d in dim[4 : 1 + ndim] if d > 0] or [1]))
            if extra != 1:
                raise ValueError(
                    f"{path}: {ndim}D volume with non-singleton higher dims "
                    f"{dim[4:1+ndim]} not supported (3D MRI expected)"
                )
        datatype = struct.unpack(endian + "h", hdr[70:72])[0]
        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype code {datatype}")
        np_dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
        pixdim = struct.unpack(endian + "8f", hdr[76:108])
        vox_offset = struct.unpack(endian + "f", hdr[108:112])[0]
        scl_slope = struct.unpack(endian + "f", hdr[112:116])[0]
        scl_inter = struct.unpack(endian + "f", hdr[116:120])[0]
        qform_code = struct.unpack(endian + "h", hdr[252:254])[0]
        sform_code = struct.unpack(endian + "h", hdr[254:256])[0]
        quatern = struct.unpack(endian + "3f", hdr[256:268])
        qoffset = struct.unpack(endian + "3f", hdr[268:280])
        srow = np.array(
            [
                struct.unpack(endian + "4f", hdr[280:296]),
                struct.unpack(endian + "4f", hdr[296:312]),
                struct.unpack(endian + "4f", hdr[312:328]),
            ]
        )

        # RAS affine
        if sform_code > 0:
            affine = np.eye(4)
            affine[:3, :] = srow
        elif qform_code > 0:
            qfac = -1.0 if pixdim[0] < 0 else 1.0
            rot = _quat_to_rotation(*quatern, qfac)
            affine = np.eye(4)
            affine[:3, :3] = rot @ np.diag(pixdim[1:4])
            affine[:3, 3] = qoffset
        else:
            affine = np.diag([pixdim[1] or 1.0, pixdim[2] or 1.0, pixdim[3] or 1.0, 1.0])

        nvox = int(np.prod(shape_xyz))
        offset = max(int(vox_offset), 348)
        skip = offset - 348
        if skip:
            f.read(skip)
        raw = f.read(nvox * np_dtype.itemsize)
        if len(raw) < nvox * np_dtype.itemsize:
            raise ValueError(f"{path}: truncated voxel data")
        arr = np.frombuffer(raw, dtype=np_dtype, count=nvox)
        # NIfTI voxel data is x-fastest (Fortran); reshape to (z, y, x)
        vol = arr.reshape(shape_xyz[::-1]).astype(np.float32)
        if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
            slope = scl_slope if scl_slope != 0.0 else 1.0
            vol = vol * slope + scl_inter

    # RAS -> LPS (ITK): negate first two rows
    lps = affine.copy()
    lps[0, :] *= -1.0
    lps[1, :] *= -1.0
    m = lps[:3, :3]
    spacing = np.linalg.norm(m, axis=0)
    spacing[spacing == 0] = 1.0
    direction = m / spacing[None, :]
    meta = ImageMeta(
        origin=lps[:3, 3].astype(np.float64),
        spacing=spacing.astype(np.float64),
        direction=direction.astype(np.float64),
        filename=str(path),
    )
    return vol, meta


def write_nifti(path, vol_zyx: np.ndarray, meta: Optional[ImageMeta] = None,
                dtype=np.float32) -> None:
    """Write (z, y, x) volume as .nii or .nii.gz (sform, RAS, little-endian)."""
    path = Path(path)
    vol = np.asarray(vol_zyx)
    if vol.ndim != 3:
        raise ValueError(f"expected 3D (z, y, x) volume, got shape {vol.shape}")
    if meta is None:
        meta = ImageMeta(
            origin=np.zeros(3), spacing=np.ones(3), direction=np.eye(3)
        )
    np_dtype = np.dtype(dtype)
    if np_dtype == np.float16:
        # NIfTI-1 defines no float16 datatype; ITK's NiftiImageIO writes a
        # half-precision array as float32. The reference pipeline casts
        # tensors to float16 before saving (transforms2.py:82-87), so the
        # observable behavior is "values truncated to half precision,
        # stored as float32" — reproduce exactly that.
        vol = vol.astype(np.float16)
        np_dtype = np.dtype(np.float32)
    if np_dtype not in _DTYPE_CODES:
        raise ValueError(f"unsupported write dtype {np_dtype}")

    shape_xyz = vol.shape[::-1]
    lps = np.eye(4)
    lps[:3, :3] = meta.direction @ np.diag(meta.spacing)
    lps[:3, 3] = meta.origin
    ras = lps.copy()
    ras[0, :] *= -1.0
    ras[1, :] *= -1.0

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dim = [3, *shape_xyz, 1, 1, 1, 1]
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, _DTYPE_CODES[np_dtype])
    struct.pack_into("<h", hdr, 72, np_dtype.itemsize * 8)
    pixdim = [1.0, *[float(s) for s in meta.spacing], 1.0, 1.0, 1.0, 1.0]
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    struct.pack_into("<h", hdr, 252, 0)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code = ALIGNED_ANAT
    struct.pack_into("<4f", hdr, 280, *ras[0, :])
    struct.pack_into("<4f", hdr, 296, *ras[1, :])
    struct.pack_into("<4f", hdr, 312, *ras[2, :])
    hdr[344:348] = b"n+1\x00"

    data = np.ascontiguousarray(vol.astype(np_dtype))
    # x-fastest on disk == C-order bytes of the (z, y, x) array
    payload = bytes(hdr) + b"\x00" * 4 + data.tobytes()
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb", compresslevel=1) as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
