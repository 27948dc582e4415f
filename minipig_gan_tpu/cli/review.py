"""Visual-QA CLI: build the offline HTML review gallery (+ metric boxplots)
from an inference output directory (review_html.py / mae_plot.ipynb
replacement)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..eval.report import boxplot_png, inference_review, load_metric_json


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inference_dir")
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--limit", type=int, default=50)
    args = parser.parse_args(argv)

    out_dir = Path(args.out_dir or args.inference_dir)
    page = inference_review(args.inference_dir, out_dir, limit=args.limit)
    if page:
        print(f"review page: {page}")
    eval_json = Path(args.inference_dir) / "evaluation.json"
    if eval_json.exists():
        per_case = json.loads(eval_json.read_text())["per_case"]
        for metric, fname in (("mae", "mae_boxplot.png"), ("mse", "mse_boxplot.png")):
            series = {
                "generated": [c[f"{metric}_t2gen_vs_t2gt"] for c in per_case.values()],
                "identity(T1)": [c[f"{metric}_t1gt_vs_t2gt"] for c in per_case.values()],
            }
            out = boxplot_png(out_dir / fname, series, title=metric.upper(),
                              ylabel=metric)
            if out:
                print(f"boxplot: {out}")


if __name__ == "__main__":
    main()
