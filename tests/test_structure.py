"""structure.json schema, subject-level splits, cartesian pairing
(generate_json.py:52-99, GAN_final.py:347-366)."""

import json

import numpy as np

from minipig_gan_tpu.data import (
    count_breakdown,
    generate_structure,
    load_structure,
    make_bids_dataset,
    split_pairs,
    structure_to_pairs,
)


def test_bids_generation_and_schema(tmp_path):
    json_path = make_bids_dataset(tmp_path / "bids", n_subjects=6,
                                  shape_zyx=(8, 8, 8), splits=(0.5, 0.25, 0.25),
                                  seed=0)
    structure = load_structure(json_path)
    assert set(structure.keys()) == {"train", "validation", "test"}
    assert sum(len(v) for v in structure.values()) == 6
    # schema: split -> sub -> ses -> {t1w, t2w, meta}
    sub = next(iter(structure["train"].values()))
    ses = next(iter(sub.values()))
    assert set(ses.keys()) == {"t1w", "t2w", "meta"}
    assert len(ses["t1w"]) == 1 and ses["t1w"][0].endswith("T1w.nii.gz")


def test_no_subject_leakage(tmp_path):
    json_path = make_bids_dataset(tmp_path / "bids", n_subjects=8,
                                  shape_zyx=(8, 8, 8), seed=1)
    structure = load_structure(json_path)
    subs = {s: set(structure[s].keys()) for s in structure}
    assert not (subs["train"] & subs["validation"])
    assert not (subs["train"] & subs["test"])
    assert not (subs["validation"] & subs["test"])


def test_cartesian_pairing():
    structure_split = {
        "sub-1": {
            "ses-1": {"t1w": ["a1", "a2"], "t2w": ["b1", "b2", "b3"], "meta": {}},
            "ses-2": {"t1w": ["c1"], "t2w": [], "meta": {}},  # filtered out
        },
        "sub-2": {"ses-1": {"t1w": [], "t2w": ["d1"], "meta": {}}},  # filtered
    }
    pairs = structure_to_pairs(structure_split)
    assert len(pairs) == 6  # 2 x 3
    assert {"t1w": "a1", "t2w": "b3"} in pairs
    assert all(set(p.keys()) == {"t1w", "t2w"} for p in pairs)


def test_count_breakdown(tmp_path):
    json_path = make_bids_dataset(tmp_path / "bids", n_subjects=4,
                                  shape_zyx=(8, 8, 8), seed=2)
    structure = load_structure(json_path)
    counts = count_breakdown(structure)
    total_pairs = sum(c["pairs"] for c in counts.values())
    all_pairs = split_pairs(structure)
    assert total_pairs == sum(len(v) for v in all_pairs.values()) == 4


def test_split_fractions(tmp_path):
    root = tmp_path / "bids"
    for i in range(10):
        d = root / f"sub-{i:03d}" / "ses-01"
        d.mkdir(parents=True)
        (d / f"x_T1w.nii.gz").write_bytes(b"")
        (d / f"x_T2w.nii.gz").write_bytes(b"")
    s = generate_structure(str(root), splits=(0.8, 0.1, 0.1), seed=3)
    assert len(s["train"]) == 8 and len(s["validation"]) == 1 and len(s["test"]) == 1


def test_split_path_list_no_leakage():
    from minipig_gan_tpu.data.structure import split_path_list

    paths = [f"/d/sub-{i:03d}/ses-01/sub-{i:03d}_run-{r}_T1w.nii.gz"
             for i in range(10) for r in (1, 2)]
    out = split_path_list(paths, (0.8, 0.1, 0.1), seed=0)
    assert sum(len(v) for v in out.values()) == 20
    import re
    subs = {k: {re.search(r"sub-\d+", p).group(0) for p in v}
            for k, v in out.items()}
    assert not (subs["train"] & subs["test"])
    assert not (subs["train"] & subs["validation"])
    assert len(subs["train"]) == 8


def test_split_path_list_reference_semantics():
    """Count-cut + train>val>test subject repair (T1w_data_split.py:29-61)."""
    from minipig_gan_tpu.data.structure import split_path_list_reference

    # 10 subjects x 2 runs = 20 sorted paths; count cut at 16/2/2 lands
    # sub-008's two runs across val/test and sub-009's across test only.
    paths = [f"/d/sub-{i:03d}/ses-01/sub-{i:03d}_run-{r}_T1w.nii.gz"
             for i in range(10) for r in (1, 2)]
    out = split_path_list_reference(paths, (0.8, 0.1, 0.1))
    assert set(out) == {"train", "val", "test"}
    assert sum(len(v) for v in out.values()) == 20
    import re
    subs = {k: {re.search(r"sub-\d+", p).group(0) for p in v}
            for k, v in out.items()}
    # no subject in two splits
    assert not (subs["train"] & subs["val"])
    assert not (subs["train"] & subs["test"])
    assert not (subs["val"] & subs["test"])
    # sub-008 straddled the val/test cut -> val wins (precedence)
    assert "sub-008" in subs["val"] and len(out["val"]) == 2
    assert subs["test"] == {"sub-009"}
    # a subject straddling the train/val cut is pulled into train
    out2 = split_path_list_reference(paths, (0.75, 0.15, 0.1))
    # cut at 15 paths splits sub-007 across train/val -> train wins
    import re as _re
    s2 = {k: {_re.search(r"sub-\d+", p).group(0) for p in v}
          for k, v in out2.items()}
    assert "sub-007" in s2["train"]


def test_split_paths_cli(tmp_path):
    from minipig_gan_tpu.cli.split_paths import main as split_main
    import json as _json

    root = tmp_path / "bids"
    for i in range(5):
        d = root / f"sub-{i:03d}" / "ses-01"
        d.mkdir(parents=True)
        (d / f"sub-{i:03d}_T1w.nii.gz").write_bytes(b"")
    split_main(["--image-dir", str(root), "--modality", "T1w",
                "--out-dir", str(tmp_path)])
    data = _json.loads((tmp_path / "T1w_paths.json").read_text())
    assert set(data) == {"train", "val", "test"}  # reference key names
    assert sum(len(v) for v in data.values()) == 5
