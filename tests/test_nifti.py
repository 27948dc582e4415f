"""NIfTI codec: round trips, gzip, geometry conventions (ITK-LPS), scaling."""

import gzip
import struct

import numpy as np
import pytest

from minipig_gan_tpu.data.nifti import ImageMeta, read_nifti, write_nifti


def random_meta(seed=0):
    rs = np.random.RandomState(seed)
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    direction = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return ImageMeta(
        origin=rs.uniform(-50, 50, 3),
        spacing=rs.uniform(0.5, 3.0, 3),
        direction=direction,
    )


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_round_trip(tmp_path, ext):
    rs = np.random.RandomState(1)
    vol = rs.randn(7, 9, 11).astype(np.float32) * 100
    meta = random_meta()
    p = tmp_path / f"vol{ext}"
    write_nifti(p, vol, meta)
    vol2, meta2 = read_nifti(p)
    np.testing.assert_allclose(vol2, vol, rtol=1e-6)
    np.testing.assert_allclose(meta2.origin, meta.origin, atol=1e-4)
    np.testing.assert_allclose(meta2.spacing, meta.spacing, atol=1e-5)
    np.testing.assert_allclose(meta2.direction, meta.direction, atol=1e-5)


def test_round_trip_uint8(tmp_path):
    vol = (np.arange(4 * 5 * 6).reshape(4, 5, 6) % 256).astype(np.float32)
    p = tmp_path / "u8.nii.gz"
    write_nifti(p, vol, None, dtype=np.uint8)
    vol2, _ = read_nifti(p)
    np.testing.assert_array_equal(vol2, vol)


def test_scl_slope_applied(tmp_path):
    """Reader must honor scl_slope/scl_inter (int16 quantized volumes)."""
    vol = np.round(np.random.RandomState(2).rand(3, 4, 5) * 100).astype(np.int16)
    p = tmp_path / "scaled.nii"
    write_nifti(p, vol.astype(np.float32), None, dtype=np.int16)
    # patch slope/inter in the header
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 10.0)
    p.write_bytes(bytes(raw))
    vol2, _ = read_nifti(p)
    np.testing.assert_allclose(vol2, vol * 2.0 + 10.0, rtol=1e-6)


def test_xyz_memory_order(tmp_path):
    """NIfTI stores x-fastest; our (z, y, x) array must map index [k, j, i]
    to offset i + j*nx + k*nx*ny."""
    nz, ny, nx = 2, 3, 4
    vol = np.arange(nz * ny * nx, dtype=np.float32).reshape(nz, ny, nx)
    p = tmp_path / "order.nii"
    write_nifti(p, vol, None)
    raw = p.read_bytes()
    data = np.frombuffer(raw[352:], np.float32)
    assert data[0] == vol[0, 0, 0]
    assert data[1] == vol[0, 0, 1]          # +x neighbor adjacent
    assert data[nx] == vol[0, 1, 0]         # +y neighbor strided by nx
    assert data[nx * ny] == vol[1, 0, 0]    # +z neighbor strided by nx*ny
    # header dim must be (x, y, z)
    dim = struct.unpack("<8h", raw[40:56])
    assert tuple(dim[1:4]) == (nx, ny, nz)


def test_lps_ras_flip(tmp_path):
    """ITK-LPS identity direction == RAS sform with negated first two rows."""
    vol = np.zeros((2, 2, 2), np.float32)
    meta = ImageMeta(origin=np.array([1.0, 2.0, 3.0]), spacing=np.ones(3),
                     direction=np.eye(3))
    p = tmp_path / "lps.nii"
    write_nifti(p, vol, meta)
    raw = p.read_bytes()
    srow_x = struct.unpack("<4f", raw[280:296])
    srow_y = struct.unpack("<4f", raw[296:312])
    srow_z = struct.unpack("<4f", raw[312:328])
    assert srow_x == (-1.0, 0.0, 0.0, -1.0)
    assert srow_y == (0.0, -1.0, 0.0, -2.0)
    assert srow_z == (0.0, 0.0, 1.0, 3.0)


def test_big_endian_read(tmp_path):
    """Byte-swapped files (old scanners) decode correctly."""
    vol = np.random.RandomState(3).rand(3, 3, 3).astype(np.float32)
    p = tmp_path / "le.nii"
    write_nifti(p, vol, None)
    raw = bytearray(p.read_bytes())
    # build a big-endian variant: swap header fields we read + data
    be = bytearray(raw)
    struct.pack_into(">i", be, 0, 348)
    struct.pack_into(">8h", be, 40, *struct.unpack("<8h", raw[40:56]))
    struct.pack_into(">h", be, 70, *struct.unpack("<h", raw[70:72]))
    struct.pack_into(">8f", be, 76, *struct.unpack("<8f", raw[76:108]))
    struct.pack_into(">f", be, 108, *struct.unpack("<f", raw[108:112]))
    struct.pack_into(">f", be, 112, *struct.unpack("<f", raw[112:116]))
    struct.pack_into(">f", be, 116, *struct.unpack("<f", raw[116:120]))
    struct.pack_into(">h", be, 252, *struct.unpack("<h", raw[252:254]))
    struct.pack_into(">h", be, 254, *struct.unpack("<h", raw[254:256]))
    for off in (256, 260, 264, 268, 272, 276):
        struct.pack_into(">f", be, off, *struct.unpack("<f", raw[off:off+4]))
    for off in range(280, 328, 4):
        struct.pack_into(">f", be, off, *struct.unpack("<f", raw[off:off+4]))
    data = np.frombuffer(bytes(raw[352:]), np.float32)
    be[352:] = data.astype(">f4").tobytes()
    pb = tmp_path / "be.nii"
    pb.write_bytes(bytes(be))
    vol2, _ = read_nifti(pb)
    np.testing.assert_allclose(vol2, vol, rtol=1e-6)


def test_float16_save(tmp_path):
    """dtype=float16 reproduces the reference half-precision save path
    (transforms2.py:82-87): values truncated to f16, stored as float32
    on disk (NIfTI-1 has no half type; ITK writes float32)."""
    import numpy as np
    from minipig_gan_tpu.data.nifti import read_nifti, write_nifti

    rs = np.random.RandomState(0)
    vol = rs.randn(4, 5, 6).astype(np.float32) * 123.456
    p = tmp_path / "half.nii.gz"
    write_nifti(p, vol, dtype=np.float16)
    back, _ = read_nifti(p)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, vol.astype(np.float16).astype(np.float32))
    assert not np.array_equal(back, vol)  # precision actually truncated
