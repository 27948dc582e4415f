"""Split-generator CLI — same flags/semantics as the reference's
code/metadata/generate_json.py:14-44 (--image-dir --t1w-glob --t2w-glob
--splits 0.8 0.1 0.1 --out-dir -v), subject-level split, structure.json out.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..data.structure import count_breakdown, generate_structure, write_structure


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image-dir", required=True, help="BIDS directory")
    parser.add_argument("--t1w-glob", default="*T1w.nii.gz")
    parser.add_argument("--t2w-glob", default="*T2w.nii.gz")
    parser.add_argument("--splits", nargs="+", type=float, default=[0.8, 0.1, 0.1],
                        help="train/validation/test fractions")
    parser.add_argument("--out-dir", default="./splits")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    if not Path(args.image_dir).is_dir():
        raise SystemExit(f"{args.image_dir} must be a directory")
    if len(args.splits) != 3:
        raise SystemExit("--splits must have three values")

    structure = generate_structure(
        args.image_dir, splits=args.splits,
        t1w_glob=args.t1w_glob, t2w_glob=args.t2w_glob, seed=args.seed,
    )
    out_file = Path(args.out_dir) / "structure.json"
    write_structure(structure, out_file)
    if args.verbose:
        print(f"json written to: {out_file}")
        for split, counts in count_breakdown(structure).items():
            print(f"  {split}: {counts}")


if __name__ == "__main__":
    main()
