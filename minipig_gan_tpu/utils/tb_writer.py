"""Dependency-free TensorBoard event-file writer (scalars + images).

The reference logs through Lightning's TensorBoardLogger
(/root/reference/code/GAN/GAN_final.py:446, self.log(...) at :266-295, volume
snapshots via monai plot_2d_or_3d_image at :310-317). This container has no
tensorboard package, so this module emits the TFRecord/Event wire format
directly: any stock TensorBoard can open the resulting
events.out.tfevents.* files.

Implements just the protobuf subset needed:
  Event{wall_time=1(double), step=2(int64), file_version=3(string),
        summary=5(Summary)}
  Summary{value=1 repeated Value}; Value{tag=1, simple_value=2(float),
        image=4(Image)}
  Image{height=1, width=2, colorspace=3, encoded_image_string=4}
TFRecord framing: u64 length + masked crc32c(length) + payload +
masked crc32c(payload); plus a minimal grayscale/RGB PNG encoder for images.
"""

from __future__ import annotations

import os
import struct
import time
import zlib
from pathlib import Path
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# crc32c (Castagnoli), table-driven
# ---------------------------------------------------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf encoding
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_double(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


def _pb_int(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v


def _pb_str(field: int, v: str) -> bytes:
    return _pb_bytes(field, v.encode())


# ---------------------------------------------------------------------------
# PNG encoder (8-bit gray or RGB)
# ---------------------------------------------------------------------------

def encode_png(img: np.ndarray) -> bytes:
    """img: (H, W) or (H, W, 3) uint8."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[..., None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        c = struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        return struct.pack(">I", len(payload)) + typ + payload + c

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# the writer
# ---------------------------------------------------------------------------

class TBWriter:
    """Append-only events.out.tfevents writer."""

    def __init__(self, log_dir):
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{os.uname().nodename}"
        self._f = open(Path(log_dir) / fname, "ab")
        self._write_event(_pb_double(1, time.time()) + _pb_str(3, "brain.Event:2"))

    def _write_event(self, event_bytes: bytes) -> None:
        ln = struct.pack("<Q", len(event_bytes))
        self._f.write(ln)
        self._f.write(struct.pack("<I", _masked_crc(ln)))
        self._f.write(event_bytes)
        self._f.write(struct.pack("<I", _masked_crc(event_bytes)))
        self._f.flush()

    def scalar(self, tag: str, value: float, step: int) -> None:
        val = _pb_str(1, tag) + _pb_float(2, float(value))
        summary = _pb_bytes(1, val)
        self._write_event(
            _pb_double(1, time.time()) + _pb_int(2, int(step)) + _pb_bytes(5, summary)
        )

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: (H, W) float [0,1] / uint8, or (H, W, 3)."""
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0.0, 1.0)
            arr = (arr * 255).astype(np.uint8)
        png = encode_png(arr)
        h, w = arr.shape[:2]
        colorspace = 1 if arr.ndim == 2 else 3
        image_pb = (
            _pb_int(1, h) + _pb_int(2, w) + _pb_int(3, colorspace)
            + _pb_bytes(4, png)
        )
        val = _pb_str(1, tag) + _pb_bytes(4, image_pb)
        summary = _pb_bytes(1, val)
        self._write_event(
            _pb_double(1, time.time()) + _pb_int(2, int(step)) + _pb_bytes(5, summary)
        )

    def volume_slices(self, tag: str, vol: np.ndarray, step: int,
                      n_slices: int = 3) -> None:
        """Log axial slices of a (D, H, W[, 1]) volume in [-1, 1] — the
        equivalent of monai plot_2d_or_3d_image (GAN_final.py:313-317)."""
        v = np.asarray(vol)
        if v.ndim == 4:
            v = v[..., 0]
        v = (v - v.min()) / max(v.max() - v.min(), 1e-6)
        d = v.shape[0]
        for i, z in enumerate(np.linspace(d * 0.25, d * 0.75, n_slices).astype(int)):
            self.image(f"{tag}/slice{i}", v[z], step)

    def close(self) -> None:
        self._f.close()
