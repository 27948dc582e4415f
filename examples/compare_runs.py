"""Paired comparison of two evaluated runs (the reference's GAN.py-vs-GAN2.py
perceptual on/off experiment, done with statistics the reference never had).

Consumes the evaluation.json written by examples/collect_artifacts.py for two
runs over the SAME fixture/test split, pairs their per-case metrics by case
id, and reports per metric: mean±std of each side, the PAIRED delta
(A − B) mean±std, and a paired t statistic — so a quality A/B is judged on
within-case differences rather than across-case variance (the dominant
variance source: anatomy difficulty differs per subject far more than any
training-config effect).

Usage: python examples/compare_runs.py --a results/patch_r3 \
           --b results/patch_noperc_r3 --label-a perceptual \
           --label-b no_perceptual [--out results/ab_perceptual.json]
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

# gen-vs-gt metrics to compare (identity columns are fixture properties —
# identical on both sides by construction, reported once as context)
METRICS = [
    ("mae_t2gen_vs_t2gt", "MAE", "lower"),
    ("mse_t2gen_vs_t2gt", "MSE", "lower"),
    ("psnr_t2gen_vs_t2gt", "PSNR", "higher"),
    ("ssim_t2gen_vs_t2gt", "SSIM", "higher"),
    ("mi_t2gen_vs_t2gt", "MI", "higher"),
]


def _mean_std(xs):
    n = len(xs)
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - 1) if n > 1 else 0.0
    return m, math.sqrt(var)


def compare(eval_a: dict, eval_b: dict, label_a: str, label_b: str) -> dict:
    per_a, per_b = eval_a["per_case"], eval_b["per_case"]
    cases = sorted(set(per_a) & set(per_b))
    if not cases:
        raise SystemExit("no common test cases between the two runs")
    dropped = sorted(set(per_a) ^ set(per_b))
    out = {"label_a": label_a, "label_b": label_b, "n_cases": len(cases),
           "dropped_unpaired_cases": dropped, "metrics": {}}
    for key, name, better in METRICS:
        a = [per_a[c][key] for c in cases]
        b = [per_b[c][key] for c in cases]
        d = [x - y for x, y in zip(a, b)]
        ma, sa = _mean_std(a)
        mb, sb = _mean_std(b)
        md, sd = _mean_std(d)
        n = len(d)
        if sd > 0:
            t = md / (sd / math.sqrt(n))
        else:
            t = 0.0 if md == 0 else math.copysign(float("inf"), md)
        wins_a = sum(1 for x in d if (x < 0) == (better == "lower") and x != 0)
        out["metrics"][name] = {
            "better": better,
            f"{label_a}_mean": ma, f"{label_a}_std": sa,
            f"{label_b}_mean": mb, f"{label_b}_std": sb,
            "paired_delta_mean": md, "paired_delta_std": sd,
            "paired_t": t,
            f"cases_favoring_{label_a}": wins_a,
        }
    return out


def render(res: dict) -> str:
    la, lb = res["label_a"], res["label_b"]
    lines = [
        f"paired A/B over n={res['n_cases']} common test cases "
        f"({la} vs {lb})",
        f"| metric | {la} | {lb} | paired Δ ({la}−{lb}) | t | "
        f"cases favoring {la} |",
        "|---|---|---|---|---|---|",
    ]
    for name, m in res["metrics"].items():
        arrow = "↓" if m["better"] == "lower" else "↑"
        lines.append(
            f"| {name} {arrow} | {m[f'{la}_mean']:.4g}±{m[f'{la}_std']:.3g} "
            f"| {m[f'{lb}_mean']:.4g}±{m[f'{lb}_std']:.3g} "
            f"| {m['paired_delta_mean']:+.4g}±{m['paired_delta_std']:.3g} "
            f"| {m['paired_t']:+.2f} "
            f"| {m[f'cases_favoring_{la}']}/{res['n_cases']} |")
    if res["dropped_unpaired_cases"]:
        lines.append(f"(unpaired cases dropped: "
                     f"{', '.join(res['dropped_unpaired_cases'])})")
    return "\n".join(lines)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True, help="results dir of run A")
    p.add_argument("--b", required=True, help="results dir of run B")
    p.add_argument("--label-a", default="A")
    p.add_argument("--label-b", default="B")
    p.add_argument("--out", default=None, help="write the JSON result here")
    args = p.parse_args()

    ea = json.loads((Path(args.a) / "evaluation.json").read_text())
    eb = json.loads((Path(args.b) / "evaluation.json").read_text())
    res = compare(ea, eb, args.label_a, args.label_b)
    print(render(res))
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=1))
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
