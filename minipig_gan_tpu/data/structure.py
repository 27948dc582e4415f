"""structure.json schema: BIDS scan inventory, subject-level splits, pairing.

Reproduces the reference's metadata layer:
  * schema `{train/validation/test: {sub: {ses: {t1w: [...], t2w: [...],
    meta: {}}}}}` (/root/reference/code/metadata/structure.json, written by
    code/metadata/generate_json.py:68-99);
  * subject-level splitting (shuffle subjects, cut by percentage — split BY
    SUBJECT to avoid train/test leakage, generate_json.py:70-85);
  * cartesian T1xT2 pairing per subject-session with the "both modalities
    present" filter (GAN_final.py:347-366).
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

SPLITS = ("train", "validation", "test")


def subject_to_json(subject_path: Path, t1w_glob: str = "*T1w.nii.gz",
                    t2w_glob: str = "*T2w.nii.gz") -> Dict:
    """Glob ses*/ under one subject (generate_json.py:52-65)."""
    out = {}
    for session in sorted(subject_path.glob("ses*")):
        out[session.name] = {
            "t1w": sorted(str(p) for p in session.glob(t1w_glob)),
            "t2w": sorted(str(p) for p in session.glob(t2w_glob)),
            "meta": {},
        }
    return out


def generate_structure(
    image_dir: str,
    splits: Sequence[float] = (0.8, 0.1, 0.1),
    t1w_glob: str = "*T1w.nii.gz",
    t2w_glob: str = "*T2w.nii.gz",
    seed: Optional[int] = None,
) -> Dict:
    """Build the split structure from a BIDS directory (generate_json.py:68-86).

    Subjects are shuffled then split by cumulative percentage — never the
    individual scans, so no subject leaks across splits.
    """
    assert len(splits) == 3, "splits must be (train, validation, test)"
    subjects = sorted(Path(image_dir).glob("sub*"))
    rng = random.Random(seed)
    rng.shuffle(subjects)
    n = len(subjects)
    train_cut = splits[0] * n
    val_cut = (splits[0] + splits[1]) * n
    main: Dict = {"train": {}, "validation": {}, "test": {}}
    for i, subject in enumerate(subjects):
        if i < train_cut:
            split = "train"
        elif i < val_cut:
            split = "validation"
        else:
            split = "test"
        main[split][subject.name] = subject_to_json(subject, t1w_glob, t2w_glob)
    return main


def write_structure(structure: Dict, out_path) -> None:
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(structure, f, indent=4)


def load_structure(path) -> Dict:
    with open(path, "r") as f:
        return json.load(f)


def structure_to_pairs(structure_split: Dict) -> List[Dict[str, str]]:
    """Cartesian T1xT2 pairs per subject-session (GAN_final.py:347-366):
    every session with >=1 T1w AND >=1 T2w contributes all t1 x t2 combos."""
    pairs: List[Dict[str, str]] = []
    for subject_id in structure_split.keys():
        for session_id in structure_split[subject_id].keys():
            sess = structure_split[subject_id][session_id]
            if len(sess["t1w"]) > 0 and len(sess["t2w"]) > 0:
                for t1_file in sess["t1w"]:
                    for t2_file in sess["t2w"]:
                        pairs.append({"t1w": t1_file, "t2w": t2_file})
    return pairs


def split_pairs(structure: Dict) -> Dict[str, List[Dict[str, str]]]:
    return {s: structure_to_pairs(structure.get(s, {})) for s in SPLITS}


def split_path_list(
    paths: Sequence[str],
    splits: Sequence[float] = (0.8, 0.1, 0.1),
    seed: Optional[int] = None,
    subject_pattern: str = r"sub-[0-9A-Za-z]+",
) -> Dict[str, List[str]]:
    """Flat path-list splitter — the modality-list splits of
    code/metadata/T1w_data_split.py / T2w_data_split.py (regex `sub-\\d+`,
    T1w_data_split.py:11-14). The reference split by path count and then
    patched leakage post-hoc with subject-moving loops (:40-61); here the
    split is BY SUBJECT from the start, so no repair pass is needed."""
    import re

    assert len(splits) == 3
    by_subject: Dict[str, List[str]] = {}
    pat = re.compile(subject_pattern)
    for p in paths:
        m = pat.search(str(p))
        key = m.group(0) if m else str(p)
        by_subject.setdefault(key, []).append(str(p))
    subjects = sorted(by_subject)
    rng = random.Random(seed)
    rng.shuffle(subjects)
    n = len(subjects)
    train_cut = splits[0] * n
    val_cut = (splits[0] + splits[1]) * n
    out: Dict[str, List[str]] = {"train": [], "validation": [], "test": []}
    for i, s in enumerate(subjects):
        split = "train" if i < train_cut else (
            "validation" if i < val_cut else "test")
        out[split].extend(sorted(by_subject[s]))
    return out


def split_path_list_reference(
    paths: Sequence[str],
    splits: Sequence[float] = (0.8, 0.1, 0.1),
    subject_pattern: str = r"sub-\d+",
) -> Dict[str, List[str]]:
    """The reference's flat-list split MEMBERSHIP semantics
    (code/metadata/T1w_data_split.py:29-61 / T2w_data_split.py):

      1. sort all paths, cut by COUNT at 80%/10% (not by subject);
      2. repair subject leakage with precedence train > val > test — the
         reference's three subject-moving loops (:40-61) net out to "a
         subject with any path in the train cut keeps ALL its paths in
         train; else any path in the val cut -> all in val; else test".

    Deterministic (no shuffle — the reference has none). Split MEMBERSHIP
    is exactly the reference's (verified against a simulation of its
    mutate-while-iterating loops); within-split ORDERING is normalized to
    global sorted order, whereas the reference appends leak-repaired
    subjects' paths to the END of the receiving list — so don't pair this
    tool's output with a reference-generated list BY INDEX. Output keys
    are the reference file's: train/val/test (written to
    T1w_paths.json-style artifacts by cli/split_paths.py)."""
    import re

    assert len(splits) == 3
    ordered = sorted(str(p) for p in paths)
    n = len(ordered)
    train_num = int(n * splits[0])
    val_num = int(n * splits[1])
    pat = re.compile(subject_pattern)

    def sub_of(p: str) -> str:
        m = pat.search(p)
        return m.group(0) if m else p

    initial = (["train"] * train_num + ["val"] * val_num
               + ["test"] * (n - train_num - val_num))
    rank = {"train": 0, "val": 1, "test": 2}
    subject_split: Dict[str, str] = {}
    for p, s in zip(ordered, initial):
        sub = sub_of(p)
        if sub not in subject_split or rank[s] < rank[subject_split[sub]]:
            subject_split[sub] = s
    out: Dict[str, List[str]] = {"train": [], "val": [], "test": []}
    for p in ordered:
        out[subject_split[sub_of(p)]].append(p)
    return out


def count_breakdown(structure: Dict) -> Dict[str, Dict[str, int]]:
    """Usable (t1w AND t2w) session/subject counts per split — the data audit
    of code/metrics/count_data_breakdown.py:6-21."""
    out = {}
    for split in SPLITS:
        subjects = structure.get(split, {})
        usable_sessions = 0
        usable_subjects = 0
        n_pairs = 0
        for sub, sessions in subjects.items():
            ok = False
            for ses, d in sessions.items():
                if len(d["t1w"]) > 0 and len(d["t2w"]) > 0:
                    usable_sessions += 1
                    n_pairs += len(d["t1w"]) * len(d["t2w"])
                    ok = True
            usable_subjects += int(ok)
        out[split] = {
            "subjects": len(subjects),
            "usable_subjects": usable_subjects,
            "usable_sessions": usable_sessions,
            "pairs": n_pairs,
        }
    return out
