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
# GIF89a encoder (8-bit grayscale, animated)
# ---------------------------------------------------------------------------

def _gif_lzw_literal(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF LZW stream emitting every pixel as its literal 9-bit code with a
    CLEAR before the code table would grow past 9 bits — the classic
    'uncompressed GIF' method: correct with every decoder, no dictionary
    bookkeeping (12.5% overhead vs raw, fine for event-log frames)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    # decoder's table grows by one entry per literal after the first; reset
    # before it would need a 10th bit (table reaches 2^9 entries)
    budget = (1 << code_size) - end - 2
    count = 0
    for b in indices:
        if count == budget:
            emit(clear)
            count = 0
        emit(b)
        count += 1
    emit(end)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def encode_gif(frames: np.ndarray, fps: int = 10) -> bytes:
    """frames: (T, H, W) uint8 -> animated grayscale GIF89a bytes."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("encode_gif expects (T, H, W) uint8")
    t, h, w = frames.shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    gray = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out += gray.tobytes()  # 256x3 grayscale palette
    # netscape loop-forever extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delay_cs = max(2, round(100 / max(fps, 1)))
    for i in range(t):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([8])  # LZW min code size
        data = _gif_lzw_literal(frames[i].tobytes())
        for off in range(0, len(data), 255):
            block = data[off : off + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


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

    def animated_gif(self, tag: str, vol: np.ndarray, step: int,
                     max_out: int = 300, fps: int = 10) -> None:
        """Log a (D, H, W[, 1]) volume in [-1, 1] as an animated GIF sweeping
        the axial slices — the reference's `add_animated_gif(max_out=300,
        scale_factor=255)` (test_runs/GAN.py:455-462). At most `max_out`
        slices are kept (uniform stride), matching monai's cap."""
        v = np.asarray(vol)
        if v.ndim == 4:
            v = v[..., 0]
        v = (v - v.min()) / max(v.max() - v.min(), 1e-6)
        if v.shape[0] > max_out:
            idx = np.linspace(0, v.shape[0] - 1, max_out).astype(int)
            v = v[idx]
        gif = encode_gif((v * 255).astype(np.uint8), fps=fps)
        h, w = v.shape[1:3]
        image_pb = (
            _pb_int(1, h) + _pb_int(2, w) + _pb_int(3, 1) + _pb_bytes(4, gif)
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
