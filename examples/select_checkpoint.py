"""Validation-split checkpoint selection (reference-plus model selection).

The reference selects checkpoints by TRAINING-loss monitors alone (three
ModelCheckpoints on g_loss / g_recon_loss / d_loss,
/root/reference/code/GAN/GAN_final.py:448-472). L1-monitor selection biases
toward smooth outputs, which the binned-MI estimator punishes
(results/README.md, "Mutual information" section). This tool scores every
retained checkpoint — the monitor bests (checkpoints/index.json), the
resume checkpoint, and the archived last-<step> ladder kept by
tpu_tests/archive_checkpoints.sh — on the VALIDATION split, ranks by a
chosen metric, and writes selection.json. The held-out TEST split is never
touched here: the single selected checkpoint gets one test-split evaluation
via examples/collect_artifacts.py --ckpt <winner>, so selection cannot leak
test information.

Usage:
  python examples/select_checkpoint.py --run runs/q3_canonical \
      [--metric mi_t2gen_vs_t2gt] [--out runs/q3_canonical/selection] \
      [--bn-recalibrate 0] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parents[1]))

# metrics where larger is better; everything else (mae/mse) is minimized
_MAXIMIZE = ("psnr", "ssim", "mi_")


def _direction(metric: str) -> int:
    return 1 if any(metric.startswith(p) or p in metric for p in _MAXIMIZE) \
        else -1


def candidate_checkpoints(run_dir: Path):
    """(label, path) for every retained checkpoint, deduped by path."""
    ckpt_dir = run_dir / "checkpoints"
    seen = {}

    def add(label: str, path: Path):
        p = str(path.resolve())
        if path.is_dir() and (path / "state").exists() and p not in seen:
            seen[p] = (label, path)

    idx = ckpt_dir / "index.json"
    if idx.exists():
        for metric, entry in json.loads(idx.read_text()).items():
            for _, p in entry.get("top", []):
                add(f"best_{metric}", Path(p))
    js = ckpt_dir / "last_step.json"
    if js.exists():
        try:
            add("last", Path(json.loads(js.read_text())["path"]))
        except (json.JSONDecodeError, KeyError):
            pass
    for d in sorted((ckpt_dir / "archive").glob("last-*"),
                    key=lambda d: int(d.name.split("-")[-1])):
        add(d.name, d)
    return list(seen.values())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True)
    p.add_argument("--metric", default="mi_t2gen_vs_t2gt")
    p.add_argument("--split", default="validation")
    p.add_argument("--out", default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--bn-recalibrate", type=int, default=0)
    p.add_argument("--skip-steps-below", type=int, default=0,
                   help="ignore archived last-<step> ladder entries below "
                        "this step (early checkpoints are never winners)")
    args = p.parse_args()

    import jax

    if os.environ.get("MINIPIG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MINIPIG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from minipig_gan_tpu.eval.inference import run_inference

    run_dir = Path(args.run)
    out_dir = Path(args.out or run_dir / "selection")
    out_dir.mkdir(parents=True, exist_ok=True)
    structure = run_dir / "synthetic_data" / "structure.json"

    cands = candidate_checkpoints(run_dir)
    cands = [
        (label, path) for label, path in cands
        if not (label.startswith("last-")
                and int(label.split("-")[-1]) < args.skip_steps_below)
    ]
    if not cands:
        raise SystemExit(f"no checkpoints found under {run_dir}/checkpoints")
    print(f"scoring {len(cands)} checkpoints on the {args.split} split "
          f"by {args.metric}")

    rows = []
    for label, path in cands:
        res = run_inference(
            str(path),
            structure_json=str(structure),
            out_dir=str(out_dir / f"val_{label}"),
            save_volumes=False,
            split=args.split,
            limit=args.limit,
            bn_recalib_batches=args.bn_recalibrate,
        )
        agg = res["aggregate"]
        rows.append({
            "label": label,
            "checkpoint": str(path),
            "value": agg.get(args.metric),
            "aggregate": {k: v for k, v in agg.items()
                          if not k.endswith("_std")},
        })
        print(f"  {label}: {args.metric}={agg.get(args.metric):.4f} "
              f"(mae={agg.get('mae_t2gen_vs_t2gt', float('nan')):.3f} "
              f"mi_identity={agg.get('mi_t1gt_vs_t2gt', float('nan')):.4f})")

    sign = _direction(args.metric)
    ranked = sorted(rows, key=lambda r: sign * (r["value"] if r["value"]
                                                is not None else -1e30),
                    reverse=True)
    winner = ranked[0]
    selection = {
        "split": args.split,
        "metric": args.metric,
        "direction": "max" if sign > 0 else "min",
        "bn_recalibrate": args.bn_recalibrate,
        "winner": winner,
        "ranking": ranked,
    }
    (out_dir / "selection.json").write_text(json.dumps(selection, indent=2))
    print(f"\nwinner: {winner['label']} ({args.metric}={winner['value']:.4f})")
    print(f"selection written to {out_dir / 'selection.json'}")
    print("evaluate it ONCE on the test split with:\n"
          f"  python examples/collect_artifacts.py --run {run_dir} "
          f"--ckpt {winner['checkpoint']} --out results/<name>")


if __name__ == "__main__":
    main()
