"""Dict-transform API: full 6-stage pipeline round trip (the
custom_transforms_test.py:91-126 scenario), save naming, threshold, resize."""

import numpy as np
from pathlib import Path

from minipig_gan_tpu.data.nifti import read_nifti, write_nifti
from minipig_gan_tpu.data.synthetic import synthetic_pair
from minipig_gan_tpu.data.transforms import (
    AddChanneld,
    BinaryThresholdd,
    Compose,
    Lambdad,
    LoadNiftid,
    MinipigResampled,
    ResamplePaird,
    Resized,
    SaveNiftid,
    ScaleIntensityRangePercentilesd,
    ToArrayd,
)


def make_pair_files(tmp_path, shape=(24, 24, 24), seed=0):
    t1, t2, meta = synthetic_pair(shape, seed=seed)
    p1 = tmp_path / "sub-x_T1w.nii.gz"
    p2 = tmp_path / "sub-x_T2w.nii.gz"
    write_nifti(p1, t1, meta)
    write_nifti(p2, t2, meta)
    return p1, p2


def test_full_pipeline_round_trip(tmp_path):
    """The reference's 6-stage Compose (GAN_final.py:381-398) + save-out for
    visual check (custom_transforms_test.py writes result NIfTIs)."""
    p1, p2 = make_pair_files(tmp_path)
    out_dir = tmp_path / "out"
    pipeline = Compose([
        LoadNiftid(keys=["t1w", "t2w"]),
        ResamplePaird(keys=["t1w", "t2w"], output_size=(16, 16, 16)),
        ScaleIntensityRangePercentilesd(
            keys=["t1w", "t2w"], lower=1.0, upper=99.0, b_min=-1.0, b_max=1.0),
        AddChanneld(keys=["t1w", "t2w"]),
        ToArrayd(keys=["t1w", "t2w"]),
    ])
    d = pipeline({"t1w": str(p1), "t2w": str(p2)})
    assert d["t1w"].shape == (16, 16, 16, 1)
    assert d["t1w"].min() >= -1.0 and d["t1w"].max() <= 1.0
    # grid meta reflects the canonical grid (2mm-equivalent scaled to 16)
    np.testing.assert_allclose(d["t1w_meta"].spacing, [16.0] * 3)
    np.testing.assert_allclose(d["t1w_meta"].origin, [-8.0] * 3)

    # save path naming: {basename}_{postfix}.{ext} (transforms2.py:98-117)
    saver = SaveNiftid(keys=["t1w"], out_dir=out_dir, output_postfix="inf")
    d2 = dict(d)
    d2["t1w"] = d["t1w"][..., 0]
    saver(d2)
    assert (out_dir / "sub-x_T1w_inf.nii.gz").exists()


def test_minipig_resampled_keeps_fov(tmp_path):
    p1, _ = make_pair_files(tmp_path, seed=1)
    d = Compose([
        LoadNiftid(keys=["t1w"]),
        MinipigResampled(keys=["t1w"], output_size=(16, 16, 16)),
    ])({"t1w": str(p1)})
    vol, meta = read_nifti(p1)
    expected_spacing = np.asarray(vol.shape[::-1]) * meta.spacing / 16.0
    np.testing.assert_allclose(d["t1w_meta"].spacing, expected_spacing, rtol=1e-6)
    assert d["t1w"].shape == (16, 16, 16)


def test_binary_threshold():
    d = BinaryThresholdd(keys=["label"], low=0, high=1, threshold_value=5)(
        {"label": np.array([[1.0, 5.0], [7.0, 2.0]])})
    np.testing.assert_array_equal(d["label"], [[0, 1], [1, 0]])


def test_resized_shape_and_meta(tmp_path):
    p1, _ = make_pair_files(tmp_path, shape=(20, 24, 28), seed=2)
    d = Compose([
        LoadNiftid(keys=["t1w"]),
        Resized(keys=["t1w"], spatial_size=(10, 12, 14)),
    ])({"t1w": str(p1)})
    assert d["t1w"].shape == (10, 12, 14)
    vol, meta = read_nifti(p1)
    np.testing.assert_allclose(
        d["t1w_meta"].spacing, meta.spacing * 2.0, rtol=1e-6)


def test_resized_identity():
    rs = np.random.RandomState(0)
    vol = rs.rand(8, 8, 8).astype(np.float32)
    d = Resized(keys=["v"], spatial_size=(8, 8, 8))({"v": vol})
    np.testing.assert_allclose(d["v"], vol, atol=1e-6)


def test_lambdad_round():
    d = Lambdad(keys=["x"], func=np.round)({"x": np.array([1.4, 1.6])})
    np.testing.assert_array_equal(d["x"], [1.0, 2.0])
