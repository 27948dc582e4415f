"""Data audit CLI — usable session/subject/pair counts per split
(code/metrics/count_data_breakdown.py:6-21 replacement)."""

from __future__ import annotations

import argparse
import json

from ..data.structure import count_breakdown, load_structure


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("structure_json")
    args = parser.parse_args(argv)
    print(json.dumps(count_breakdown(load_structure(args.structure_json)),
                     indent=2))


if __name__ == "__main__":
    main()
