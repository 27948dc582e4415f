"""Synthetic brain-like NIfTI fixtures — CPU-testable stand-in for the
PREDICT-HD BIDS dataset the reference trains on (SURVEY.md §7.1: "synthetic-
volume fixture so everything below is CPU-testable").

Generates T1w/T2w pairs with a shared anatomy (nested ellipsoids ≈ skull /
gray / white / ventricles) but modality-specific contrast, arbitrary
spacing/origin/direction — so the resampler, normalizer, trainer, and eval
all exercise realistic geometry without real data. Can also emit a full BIDS
tree + structure.json for end-to-end CLI tests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .nifti import ImageMeta, write_nifti
from .structure import generate_structure, write_structure


# tissue contrast (T1w, T2w) per compartment, roughly MRI-like. Skull/scalp
# and CSF deliberately SHARE the T1w intensity (both are T1-dark in real
# scans) while sitting at opposite ends of the T2w scale — the voxelwise
# T1->T2 value map is therefore ambiguous, exactly like real data, which is
# why the T1-identity baseline's MI is weak there (BASELINE.md: identity MI
# 0.196 << generated 0.292) and why a CONTEXT-using generator can beat it:
# the surrounding anatomy disambiguates what a lone intensity cannot.
_COMPARTMENTS = (
    # (semiaxis scale, t1 intensity, t2 intensity)
    (1.00, 0.20, 0.20),  # skull/scalp
    (0.85, 0.75, 0.45),  # white matter
    (0.60, 0.55, 0.65),  # gray matter
    (0.25, 0.20, 0.95),  # ventricles / CSF
)

# Optional deep structures (`n_blobs`): each class REUSES an existing
# compartment's T1 intensity (so the voxelwise T1->T2 value map is
# ambiguous) while carrying its own T2 intensity, and is identifiable from
# SPATIAL context alone — size and surrounding tissue — which a conv
# receptive field sees and a lone intensity cannot. This is the dominant
# mechanism of real cross-modality data (cysts, calcifications, deep
# nuclei all T1-isointense with other tissue but T2-distinct) and what
# makes the reference's real-data T1-identity baseline WEAK on estimated
# MI (BASELINE.md: identity 0.196 << generated 0.292 << self 0.445). The
# blob-free default fixture lacks it — its dark-T1 voxels are 96% skull by
# volume, so identity MI sits at 97% of the clean-oracle ceiling and no
# trained generator can land the reference's MI ordering there
# (docs/ROUND7_NOTES.md #5-7: texture, GDL, fine-tune and intensity-LUT
# attacks all measured dead).
#   (t1 level, t2 level, radius range, center-radius band, name)
_BLOB_CLASSES = (
    # dark-T1 like skull/CSF; big and T2-bright — a cyst. Radii are sized
    # for the training fixture's source resolution (spatial_size//2, i.e.
    # 64^3 for the canonical 128^3 grid): 0.2 normalized units ~ 5 voxels.
    (0.20, 0.80, (0.180, 0.260), (0.38, 0.60), "cyst"),
    # dark-T1; small and T2-darkest — a calcification (size separates it
    # from the cyst; both separate from skull/shell and ventricles/center
    # by position)
    (0.20, 0.08, (0.070, 0.110), (0.35, 0.70), "calcification"),
    # gray-matter T1 inside the white shell; T2-dark — a deep nucleus
    (0.55, 0.30, (0.110, 0.160), (0.62, 0.74), "nucleus"),
    # white-matter T1 inside the gray core; T2-dark — an ectopic WM island
    (0.75, 0.15, (0.110, 0.160), (0.32, 0.50), "wm_island"),
)


def synthetic_pair(
    shape_zyx: Tuple[int, int, int] = (48, 56, 44),
    spacing: Optional[Sequence[float]] = None,
    seed: int = 0,
    rotate: bool = False,
    extent_mm: float = 220.0,
    shared_tex: float = 0.08,
    indep_tex: float = 0.02,
    noise: float = 0.015,
    n_blobs: int = 0,
    t1_bias: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, ImageMeta]:
    """Return (t1w, t2w, meta) with shared anatomy, differing contrast.

    Default spacing is derived from `extent_mm` so the phantom occupies a
    head-realistic physical extent — the human canonical 256mm resampling grid
    (transforms.py:140-147) then actually samples it.

    Texture model (round-3 revision, twice calibrated): the in-head texture
    decomposes into a SHARED anatomical component (`shared_tex`, entering
    the two modalities with OPPOSED sign — the real contrast-inversion
    mechanism) plus an INDEPENDENT per-modality component (`indep_tex`),
    and both modalities carry independent receiver noise (`noise`). Two
    failure modes of earlier fixtures motivated the calibration, both
    measured with tpu_tests/oracle_floor.py against the reference's eval
    chain (independent [0,255] min/max rescale, inferrence.py:150-162):

    * round-2 fixture (identical texture realization, ~1% noise): the T1
      voxel value nearly determined T2, so the T1-identity baseline's
      estimated MI was unrealistically strong — INVERTED vs the reference's
      real-data anchors (gen 0.292 > identity 0.196, code/eval/*.xml).
    * first round-3 fixture (noise=0.12): receiver noise DOMINATED the
      [0,255]-rescale oracles — a PERFECT clean-T2 generator measured MAE
      29.1 vs identity 12.3 (oracle_floor.py), i.e. no clean generator
      could beat identity on MAE/MSE/PSNR at all; the eval rewarded
      noise-matching.

    At the committed defaults the measured oracle floors land near the
    reference's real-data numbers and every anchored oracle is winnable:
    perfect-generator MAE 4.4 vs identity 8.9 (reference: 4.365 vs 11.851),
    PSNR 34.8 vs 20.2, MI 0.796 vs 0.747 (trained checkpoints track the
    clean-oracle MI to ~98%, results/canonical_r3). The MI ordering is
    regression-guarded in tests/test_fixture_mi_ordering.py.

    `n_blobs` > 0 additionally paints that many deep structures from
    _BLOB_CLASSES (round-robin) — T1-isointense with another compartment
    but T2-distinct, resolvable only from spatial context. `t1_bias` > 0
    multiplies T1 by a smooth random gain field 1 + t1_bias*g (a scanner
    bias field, the artifact N4/ITK bias correction exists for): the
    absolute T1 intensity no longer identifies tissue — the same class
    lands at different intensities in different corners of the volume —
    which is invisible to the voxelwise T1-identity baseline but
    correctable by a generator with global context. Both default to the
    historical fixture (bit-identical at n_blobs=0, t1_bias=0)."""
    rng = np.random.RandomState(seed)
    if spacing is None:
        jitter = rng.uniform(0.85, 1.1, 3)
        # spacing is ordered (x, y, z) like ImageMeta
        spacing = [extent_mm * j / s for j, s in zip(jitter, shape_zyx[::-1])]
    z, y, x = shape_zyx
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, z), np.linspace(-1, 1, y), np.linspace(-1, 1, x),
        indexing="ij",
    )
    # random per-subject anatomy wobble
    cz, cy, cx = rng.uniform(-0.08, 0.08, 3)
    az, ay, ax = 0.82 + rng.uniform(-0.05, 0.05, 3)
    r = np.sqrt(((zz - cz) / az) ** 2 + ((yy - cy) / ay) ** 2 + ((xx - cx) / ax) ** 2)

    t1 = np.zeros(shape_zyx, np.float32)
    t2 = np.zeros(shape_zyx, np.float32)
    for scale, i1, i2 in _COMPARTMENTS:
        mask = r < scale
        t1[mask] = i1
        t2[mask] = i2
    if n_blobs:
        # Deep structures (_BLOB_CLASSES). Drawn from a DERIVED RandomState
        # so (a) n_blobs=0 is bit-identical to the historical fixture and
        # (b) the blob geometry is invariant to the texture/noise settings
        # — the clean-oracle regeneration (same seed, noise=0.0) keeps the
        # exact anatomy, which tpu_tests/oracle_floor.py relies on.
        brng = np.random.RandomState((seed * 7919 + 4242) % (2**31))
        for bi in range(n_blobs):
            i1, i2, (r0, r1), (c0, c1), _name = \
                _BLOB_CLASSES[bi % len(_BLOB_CLASSES)]
            rad = brng.uniform(r0, r1)
            u = brng.randn(3)
            u /= max(float(np.linalg.norm(u)), 1e-9)
            rc = brng.uniform(c0, c1)
            bz, by, bx = np.array([cz, cy, cx]) + u * rc * np.array([az, ay, ax])
            rb = np.sqrt(
                ((zz - bz) / (rad * az)) ** 2
                + ((yy - by) / (rad * ay)) ** 2
                + ((xx - bx) / (rad * ax)) ** 2
            )
            mask = rb < 1.0
            t1[mask] = i1
            t2[mask] = i2
    # Texture (see docstring): shared + independent smooth components inside
    # the head, independent receiver noise everywhere. Applied only INSIDE
    # the head because real scans share anatomy but their background is
    # independent receiver noise — a correlated background would make the
    # T1-identity baseline unrealistically strong (reference real-data
    # anchors: identity MAE 11.851 vs generated 4.365; MI(t1,t2)=0.196 <<
    # self-MI 0.445).
    def _smooth(v: np.ndarray) -> np.ndarray:
        for axis in range(3):  # cheap blur
            v = 0.5 * v + 0.25 * (np.roll(v, 1, axis) + np.roll(v, -1, axis))
        return v

    tex_shared = _smooth(rng.randn(*shape_zyx).astype(np.float32))
    tex_t1 = _smooth(rng.randn(*shape_zyx).astype(np.float32))
    tex_t2 = _smooth(rng.randn(*shape_zyx).astype(np.float32))
    inside = (r < _COMPARTMENTS[0][0]).astype(np.float32)
    # The shared anatomical component enters the two modalities with OPPOSED
    # sign — the real T1w/T2w contrast-inversion mechanism (more free water:
    # darker T1w, brighter T2w; more myelin: the reverse). This is what makes
    # the T1-identity baseline weak on real data (BASELINE.md: identity MAE
    # 11.851 vs generated 4.365, identity MI 0.196 << generated 0.292) while
    # the mapping stays fully LEARNABLE: a generator can recover T2's shared
    # component from T1 by inverting its response.
    t1 += (shared_tex * tex_shared + indep_tex * tex_t1) * inside \
        + noise * rng.randn(*shape_zyx).astype(np.float32)
    t2 += (-shared_tex * tex_shared + indep_tex * tex_t2) * inside \
        + noise * rng.randn(*shape_zyx).astype(np.float32)
    if t1_bias:
        # Smooth multiplicative gain field: a coarse 3^3 Gaussian grid
        # trilinearly upsampled to the volume. Drawn from a DERIVED
        # RandomState (same derivation rule as the blobs) so the field is
        # identical across texture/noise settings — the oracle
        # regenerations in tpu_tests/{oracle_floor,mi_fixture_analysis}.py
        # depend on that invariance.
        grng = np.random.RandomState((seed * 6007 + 1717) % (2**31))
        k = 5  # control grid: coarse enough to stay smooth, fine enough
        #        to vary across the head (which fills the central third)
        coarse = grng.randn(k, k, k)
        f = coarse
        for ax, n in enumerate(shape_zyx):
            pts = np.linspace(0, k - 1, n)
            i0 = np.clip(pts.astype(np.int64), 0, k - 2)
            w = (pts - i0).reshape([-1 if a == ax else 1 for a in range(3)])
            f = (1 - w) * np.take(f, i0, axis=ax) \
                + w * np.take(f, i0 + 1, axis=ax)
        f = (f - float(f.mean())) / max(float(f.std()), 1e-9)
        t1 *= np.clip(1.0 + t1_bias * f, 0.4, None).astype(np.float32)
    t1 *= 1000.0  # MRI-like raw intensity scale
    t2 *= 800.0

    spacing = np.asarray(spacing, np.float64)
    size_xyz = np.asarray(shape_zyx[::-1], np.float64)
    direction = np.eye(3)
    if rotate:
        th = rng.uniform(-0.2, 0.2)
        c, s = np.cos(th), np.sin(th)
        direction = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    # center the volume near the AC-at-origin convention (transforms.py:154-159)
    origin = -(direction @ (spacing * (size_xyz - 1) / 2.0))
    meta = ImageMeta(origin=origin, spacing=spacing, direction=direction)
    return t1, t2, meta


def make_bids_dataset(
    root,
    n_subjects: int = 4,
    sessions_per_subject: int = 1,
    shape_zyx: Tuple[int, int, int] = (48, 56, 44),
    splits: Sequence[float] = (0.5, 0.25, 0.25),
    seed: int = 0,
    gzip: bool = True,
    n_blobs: int = 0,
    t1_bias: float = 0.0,
) -> str:
    """Write a synthetic BIDS tree and its structure.json; returns json path."""
    root = Path(root)
    ext = ".nii.gz" if gzip else ".nii"
    for si in range(n_subjects):
        for se in range(sessions_per_subject):
            ses_dir = root / f"sub-{si:04d}" / f"ses-{se:02d}"
            ses_dir.mkdir(parents=True, exist_ok=True)
            t1, t2, meta = synthetic_pair(
                shape_zyx=shape_zyx, seed=seed * 1000 + si * 10 + se,
                n_blobs=n_blobs, t1_bias=t1_bias,
            )
            write_nifti(ses_dir / f"sub-{si:04d}_ses-{se:02d}_T1w{ext}", t1, meta)
            write_nifti(ses_dir / f"sub-{si:04d}_ses-{se:02d}_T2w{ext}", t2, meta)
    structure = generate_structure(
        str(root), splits=splits,
        t1w_glob=f"*T1w{ext}", t2w_glob=f"*T2w{ext}", seed=seed,
    )
    json_path = root / "structure.json"
    write_structure(structure, json_path)
    return str(json_path)
