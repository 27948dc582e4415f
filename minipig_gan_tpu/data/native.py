"""ctypes binding to the native C++ preprocessing runtime (native/
minipig_native.cc) — the ITK-replacement fast path for NIfTI decode,
trilinear resampling, and percentile windowing (SURVEY.md §2 native items
1/2/5). Auto-builds with `make -C native` on first use; every entry point
has a pure-Python fallback (data/nifti.py, ops/resample.py), so the
framework works without a toolchain — the native path just makes cache
builds several times faster and GIL-free (thread-pool workers actually run
in parallel).
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..ops.resample import GridSpec, resample_affine
from .nifti import ImageMeta, read_nifti as _read_nifti_py

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libminipig_native.so"

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB_PATH.exists():
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.mp_read_file.restype = ctypes.c_long
            lib.mp_read_file.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))
            ]
            lib.mp_free.argtypes = [ctypes.c_void_p]
            lib.mp_convert_to_float.restype = ctypes.c_int
            lib.mp_convert_to_float.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_long,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.mp_resample_trilinear.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.mp_percentile_scale.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def read_nifti_native(path) -> Tuple[np.ndarray, ImageMeta]:
    """NIfTI read with C++ inflate + dtype convert; header parsed in Python
    (cheap) with identical geometry semantics to data/nifti.py."""
    lib = _load_lib()
    if lib is None:
        return _read_nifti_py(path)
    buf_ptr = ctypes.POINTER(ctypes.c_ubyte)()
    size = lib.mp_read_file(str(path).encode(), ctypes.byref(buf_ptr))
    if size < 352:
        if size >= 0:
            lib.mp_free(buf_ptr)
        return _read_nifti_py(path)
    try:
        hdr = bytes(bytearray(buf_ptr[:348]))
        sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
        endian = "<"
        if sizeof_hdr != 348:
            if struct.unpack(">i", hdr[0:4])[0] != 348:
                raise ValueError(f"{path}: not NIfTI-1")
            endian = ">"
        if hdr[344:347] not in (b"n+1", b"ni1"):
            raise ValueError(f"{path}: bad magic")
        dim = struct.unpack(endian + "8h", hdr[40:56])
        shape_xyz = tuple(dim[1:4]) if dim[0] >= 3 else (
            tuple(dim[1:1 + dim[0]]) + (1,) * (3 - dim[0]))
        if dim[0] > 3:
            extra = 1
            for d in dim[4:1 + dim[0]]:
                if d > 0:
                    extra *= d
            if extra != 1:
                raise ValueError(f"{path}: 4D+ volume unsupported")
        datatype = struct.unpack(endian + "h", hdr[70:72])[0]
        itemsize = {2: 1, 4: 2, 8: 4, 16: 4, 64: 8, 256: 1, 512: 2, 768: 4,
                    1024: 8}.get(datatype)
        if itemsize is None:
            raise ValueError(f"{path}: dtype code {datatype} unsupported")
        pixdim = struct.unpack(endian + "8f", hdr[76:108])
        vox_offset = max(int(struct.unpack(endian + "f", hdr[108:112])[0]), 348)
        scl_slope = struct.unpack(endian + "f", hdr[112:116])[0]
        scl_inter = struct.unpack(endian + "f", hdr[116:120])[0]
        qform_code = struct.unpack(endian + "h", hdr[252:254])[0]
        sform_code = struct.unpack(endian + "h", hdr[254:256])[0]

        n = int(np.prod(shape_xyz))
        if size < vox_offset + n * itemsize:
            raise ValueError(f"{path}: truncated voxels")
        vol = np.empty(n, np.float32)
        src = ctypes.cast(ctypes.addressof(buf_ptr.contents) + vox_offset,
                          ctypes.POINTER(ctypes.c_ubyte))
        swap = 1 if endian == ">" else 0
        if lib.mp_convert_to_float(
            src, datatype, n, swap,
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ) != 0:
            raise ValueError(f"{path}: convert failed")
        vol = vol.reshape(shape_xyz[::-1])
        if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
            slope = scl_slope if scl_slope != 0.0 else 1.0
            vol = vol * slope + scl_inter

        if sform_code > 0:
            srow = np.array([
                struct.unpack(endian + "4f", hdr[280:296]),
                struct.unpack(endian + "4f", hdr[296:312]),
                struct.unpack(endian + "4f", hdr[312:328]),
            ])
            affine = np.eye(4)
            affine[:3, :] = srow
        elif qform_code > 0:
            from .nifti import _quat_to_rotation

            quatern = struct.unpack(endian + "3f", hdr[256:268])
            qoffset = struct.unpack(endian + "3f", hdr[268:280])
            qfac = -1.0 if pixdim[0] < 0 else 1.0
            rot = _quat_to_rotation(*quatern, qfac)
            affine = np.eye(4)
            affine[:3, :3] = rot @ np.diag(pixdim[1:4])
            affine[:3, 3] = qoffset
        else:
            affine = np.diag([pixdim[1] or 1.0, pixdim[2] or 1.0,
                              pixdim[3] or 1.0, 1.0])
        lps = affine.copy()
        lps[0, :] *= -1.0
        lps[1, :] *= -1.0
        m = lps[:3, :3]
        spacing = np.linalg.norm(m, axis=0)
        spacing[spacing == 0] = 1.0
        meta = ImageMeta(
            origin=lps[:3, 3].astype(np.float64),
            spacing=spacing.astype(np.float64),
            direction=(m / spacing[None, :]).astype(np.float64),
            filename=str(path),
        )
        return np.ascontiguousarray(vol, np.float32), meta
    except ValueError:
        return _read_nifti_py(path)
    finally:
        lib.mp_free(buf_ptr)


def resample_native(vol: np.ndarray, input_meta: ImageMeta, grid: GridSpec,
                    n_threads: int = 0) -> np.ndarray:
    """C++ threaded trilinear resample; falls back to ops.resample_numpy."""
    lib = _load_lib()
    if lib is None:
        from ..ops.resample import resample_numpy

        return resample_numpy(vol, input_meta, grid)
    m, t = resample_affine(input_meta, grid)
    vol = np.ascontiguousarray(vol, np.float32)
    zo, yo, xo = grid.size_zyx
    out = np.empty((zo, yo, xo), np.float32)
    mm = np.ascontiguousarray(m, np.float64)
    tt = np.ascontiguousarray(t, np.float64)
    lib.mp_resample_trilinear(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol.shape[0], vol.shape[1], vol.shape[2],
        mm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zo, yo, xo, n_threads,
    )
    return out


def percentile_scale_native(vol: np.ndarray, lower: float, upper: float,
                            b_min: float, b_max: float, clip: bool = True
                            ) -> np.ndarray:
    """In-place-on-copy percentile window; numpy fallback."""
    lib = _load_lib()
    out = np.ascontiguousarray(vol, np.float32).copy()
    if lib is None:
        from .pipeline import percentile_normalize_numpy

        return percentile_normalize_numpy(out, lower, upper, b_min, b_max)
    lib.mp_percentile_scale(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        lower, upper, b_min, b_max, 1 if clip else 0,
    )
    return out
