"""Native C++ preprocessing runtime vs the pure-Python reference paths."""

import numpy as np
import pytest

from minipig_gan_tpu.data import native
from minipig_gan_tpu.data.nifti import ImageMeta, read_nifti, write_nifti
from minipig_gan_tpu.data.synthetic import synthetic_pair
from minipig_gan_tpu.ops.resample import (
    human_canonical_grid,
    minipig_native_grid,
    resample_numpy,
)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib not built"
)


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_native_read_matches_python(tmp_path, ext):
    t1, _, meta = synthetic_pair((12, 14, 16), seed=0)
    p = tmp_path / f"t1{ext}"
    write_nifti(p, t1, meta)
    v_py, m_py = read_nifti(p)
    v_nat, m_nat = native.read_nifti_native(p)
    np.testing.assert_allclose(v_nat, v_py, rtol=1e-6)
    np.testing.assert_allclose(m_nat.origin, m_py.origin, atol=1e-6)
    np.testing.assert_allclose(m_nat.spacing, m_py.spacing, atol=1e-6)
    np.testing.assert_allclose(m_nat.direction, m_py.direction, atol=1e-6)


def test_native_read_int16(tmp_path):
    vol = (np.random.RandomState(0).rand(6, 7, 8) * 1000).astype(np.int16)
    p = tmp_path / "i16.nii.gz"
    write_nifti(p, vol.astype(np.float32), None, dtype=np.int16)
    v_nat, _ = native.read_nifti_native(p)
    np.testing.assert_array_equal(v_nat, vol.astype(np.float32))


def test_native_resample_matches_numpy_axis_aligned():
    rs = np.random.RandomState(1)
    vol = rs.rand(20, 24, 28).astype(np.float32)
    meta = ImageMeta(origin=np.array([-14.0, -12.0, -10.0]),
                     spacing=np.array([1.0, 1.1, 0.9]), direction=np.eye(3))
    grid = minipig_native_grid(vol.shape, meta, (32, 32, 32))
    expected = resample_numpy(vol, meta, grid)
    got = native.resample_native(vol, meta, grid)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_native_resample_matches_numpy_rotated():
    rs = np.random.RandomState(2)
    vol = rs.rand(16, 18, 20).astype(np.float32)
    th = 0.25
    c, s = np.cos(th), np.sin(th)
    meta = ImageMeta(origin=np.array([-10.0, -9.0, -8.0]),
                     spacing=np.array([1.2, 1.0, 1.1]),
                     direction=np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]))
    grid = human_canonical_grid((24, 24, 24), fov_mm=24.0)
    expected = resample_numpy(vol, meta, grid)
    got = native.resample_native(vol, meta, grid)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_native_percentile_matches_numpy():
    from minipig_gan_tpu.data.pipeline import percentile_normalize_numpy

    rs = np.random.RandomState(3)
    vol = rs.gamma(2.0, 50.0, (24, 24, 24)).astype(np.float32)
    expected = percentile_normalize_numpy(vol, 1.0, 99.0, -1.0, 1.0)
    got = native.percentile_scale_native(vol, 1.0, 99.0, -1.0, 1.0)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_native_preprocessor_end_to_end(tmp_path):
    """PairPreprocessor with the native reader produces the same result."""
    from minipig_gan_tpu.config import DataConfig
    from minipig_gan_tpu.data.pipeline import PairPreprocessor

    t1, t2, meta = synthetic_pair((24, 24, 24), seed=4)
    p1, p2 = tmp_path / "a_T1w.nii.gz", tmp_path / "a_T2w.nii.gz"
    write_nifti(p1, t1, meta)
    write_nifti(p2, t2, meta)
    cfg = DataConfig(spatial_size=(16, 16, 16))
    pair = {"t1w": str(p1), "t2w": str(p2)}
    base = PairPreprocessor(cfg)(pair)
    fast = PairPreprocessor(cfg, reader=native.read_nifti_native)(pair)
    np.testing.assert_allclose(fast["t1w"], base["t1w"], atol=1e-5)
    np.testing.assert_allclose(fast["t2w"], base["t2w"], atol=1e-5)
