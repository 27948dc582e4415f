"""Flat modality path-list splitter CLI — the T1w_paths.json/T2w_paths.json
artifacts of /root/reference/code/metadata/T1w_data_split.py:62-76 (and
T2w_data_split.py).

Globs one modality's scans from a BIDS tree, splits train/val/test, and
writes `{out_dir}/{modality}_paths.json` with the reference's schema:
`{"train": [...], "val": [...], "test": [...]}`.

Two split policies:
  * default — the reference's exact split MEMBERSHIP (sorted paths,
    count-based 80/10/10 cut, then subject-leak repair with train > val >
    test precedence; deterministic, T1w_data_split.py:29-61). Within-split
    ordering is normalized to sorted order — the reference appends
    leak-repaired paths at the end instead — so don't index-align against
    a reference-generated list;
  * --by-subject — leak-free-by-construction subject-level shuffle split
    (data/structure.py split_path_list, seeded).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..data.structure import split_path_list, split_path_list_reference


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image-dir", required=True,
                        help="BIDS root (contains sub-*/ses-*/)")
    parser.add_argument("--modality", default="T1w",
                        help="modality tag; also names the output file "
                             "({modality}_paths.json)")
    parser.add_argument("--glob", default=None,
                        help="override glob (default sub-*/ses-*/*{modality}.nii.gz"
                             " — T1w_data_split.py:23)")
    parser.add_argument("--splits", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--by-subject", action="store_true",
                        help="subject-level shuffled split instead of the "
                             "reference's count-cut+repair")
    parser.add_argument("--seed", type=int, default=None,
                        help="shuffle seed (--by-subject only)")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    pattern = args.glob or f"sub-*/ses-*/*{args.modality}.nii.gz"
    paths = sorted(str(p) for p in Path(args.image_dir).glob(pattern))
    if args.verbose:
        print(f"{len(paths)} {args.modality} paths under {args.image_dir}")
    if args.by_subject:
        by_sub = split_path_list(paths, tuple(args.splits), seed=args.seed)
        split = {"train": by_sub["train"], "val": by_sub["validation"],
                 "test": by_sub["test"]}
    else:
        split = split_path_list_reference(paths, tuple(args.splits))
    out = Path(args.out_dir) / f"{args.modality}_paths.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(split, f)
    # always print the count summary, like the reference scripts' prints
    # (T1w_data_split.py:64-76)
    print(f"wrote {out}: " + ", ".join(
        f"{k}={len(v)}" for k, v in split.items()))


if __name__ == "__main__":
    main()
