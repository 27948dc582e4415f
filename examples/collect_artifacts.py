"""Collect committed-quality artifacts from a training run.

Runs test-split inference + the full metric suite on selected checkpoints
(the reference's quality-oracle chain: mean_absolute_error.json /
mean_squared_error.json / MAE ratio / boxplot, BASELINE.md rows 1-6), renders
the loss curves from metrics.jsonl, and copies the small reviewable files
into an output directory suitable for committing.

Usage: python examples/collect_artifacts.py --run runs/convergence_r2 \
           --out results/synthetic_128 [--ckpt best_recon|last|path]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

# APPEND the repo root (never prepend: the reference-parity code/ directory
# would shadow the stdlib `code` module)
sys.path.append(str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="training log dir")
    p.add_argument("--out", required=True, help="artifact output dir")
    p.add_argument("--ckpt", default="best_recon",
                   help="best_recon | last | explicit checkpoint path")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--bn-recalibrate", type=int, default=0, metavar="K",
                   help="ALSO evaluate with generator BN stats refreshed on "
                   "K train batches (cli.infer --bn-recalibrate); writes the "
                   "paired A/B to bn_recalibration_ab.json next to the "
                   "parity artifacts (which stay as-is)")
    args = p.parse_args()

    import jax

    if os.environ.get("MINIPIG_PLATFORM"):  # force-CPU when the tunnel is down
        jax.config.update("jax_platforms", os.environ["MINIPIG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from minipig_gan_tpu.eval.inference import run_inference
    from minipig_gan_tpu.eval.report import boxplot_png, loss_curve_png

    run_dir = Path(args.run)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.ckpt == "last":
        ckpt = run_dir / "checkpoints" / "last"
    elif args.ckpt == "best_recon":
        idx = json.loads((run_dir / "checkpoints" / "index.json").read_text())
        entry = idx["g_recon_loss"]
        ckpt = Path(entry["top"][0][1] if "top" in entry else entry["path"])
    else:
        ckpt = Path(args.ckpt)
    print(f"checkpoint: {ckpt}")

    result = run_inference(
        str(ckpt),
        structure_json=str(run_dir / "synthetic_data" / "structure.json"),
        out_dir=str(out / "inference"),
        save_volumes=False,
        limit=args.limit,
    )
    agg = result["aggregate"]
    per_case = result["per_case"]

    # reference-format artifact chain
    for name in ("evaluation.json", "mean_absolute_error.json",
                 "mean_squared_error.json"):
        shutil.copy(out / "inference" / name, out / name)
    boxplot_png(
        out / "mae_boxplot.png",
        {
            "T2gen vs T2gt": [c["mae_t2gen_vs_t2gt"] for c in per_case.values()],
            "T1gt vs T2gt (identity)": [c["mae_t1gt_vs_t2gt"]
                                        for c in per_case.values()],
        },
        title="MAE per test case ([0,255] scale)", ylabel="MAE",
    )
    loss_curve_png(run_dir / "metrics.jsonl", out / "loss_curves.png")

    summary = {
        "checkpoint": str(ckpt.name),
        "n_test_cases": len(per_case),
    }
    for out_key, agg_key in (
        ("mae_gen", "mae_t2gen_vs_t2gt"),
        ("mae_identity", "mae_t1gt_vs_t2gt"),
        ("mse_gen", "mse_t2gen_vs_t2gt"),
        ("mse_identity", "mse_t1gt_vs_t2gt"),
        ("psnr_gen", "psnr_t2gen_vs_t2gt"),
        ("psnr_identity", "psnr_t1gt_vs_t2gt"),
        ("ssim_gen", "ssim_t2gen_vs_t2gt"),
        ("ssim_identity", "ssim_t1gt_vs_t2gt"),
        ("mi_gen", "mi_t2gen_vs_t2gt"),
        ("mi_identity", "mi_t1gt_vs_t2gt"),
    ):
        summary[out_key] = agg.get(agg_key)
        summary[f"{out_key}_std"] = agg.get(f"{agg_key}_std")
    for k in ("mae_ratio_pct", "mae_ratio_pct_std",
              "mse_ratio_pct", "mse_ratio_pct_std"):
        summary[k] = agg.get(k)
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))

    # canonical markdown rendering of the same numbers, for verbatim
    # embedding in results/README.md (guarded by
    # tests/test_results_consistency.py — see summary_table_md docstring)
    from minipig_gan_tpu.eval.report import summary_table_md

    (out / "TABLE.md").write_text(summary_table_md(summary))

    if args.bn_recalibrate:
        # second pass with refreshed BN stats (reference-plus serving
        # option); parity artifacts above are untouched
        import importlib.util

        run_inference(
            str(ckpt),
            structure_json=str(run_dir / "synthetic_data" / "structure.json"),
            out_dir=str(out / "inference_recal"),
            save_volumes=False,
            limit=args.limit,
            bn_recalib_batches=args.bn_recalibrate,
        )
        spec = importlib.util.spec_from_file_location(
            "compare_runs", Path(__file__).parent / "compare_runs.py")
        cr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(cr)
        ab = cr.compare(
            json.loads((out / "inference_recal" / "evaluation.json")
                       .read_text()),
            json.loads((out / "inference" / "evaluation.json").read_text()),
            "recalibrated", "asis")
        (out / "bn_recalibration_ab.json").write_text(json.dumps(ab, indent=1))
        print(cr.render(ab))


if __name__ == "__main__":
    main()
