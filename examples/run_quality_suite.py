"""Round-3 quality suite: the three committed-evidence training runs at
canonical scale on one TPU chip, with n>=20 held-out test pairs and
mean±std reporting (VERDICT round-2 item 4).

Runs (all on the round-3 synthetic fixture — decomposed texture + realistic
receiver noise, data/synthetic.py — with 80 subjects: 40 train / 20 val /
20 test pairs):

  1. canonical   — 6-block CasNet + global D (GAN_final.py config),
                   g_lr=2e-3 (fixture-tuned; the reference's 5e-4 was tuned
                   for PREDICT-HD), 2500 steps with cosine LR decay;
  2. patch       — config-3: patch discriminator + perceptual loss
                   (test_runs/GAN.py), 2200 steps;
  3. patch_noperc— the reference's own ablation twin (test_runs/GAN2.py:
                   use_perceptual=False), same budget — the perceptual
                   on/off QUALITY A/B the reference ran as GAN.py vs GAN2.py.

Training runs CHUNKED: one OS process per --chunk-steps (default 1000) with
orbax resume between chunks — the axon relay client memoizes executions on
the host, growing ~45 MB/step of RSS at 128^3 (a single 2500-step process
reaches the 125 GB box ceiling around step ~1700).

Each run is evaluated at its best-g_recon checkpoint on the 20 test pairs
via examples/collect_artifacts.py (per-case metrics, mean±std, reference-
format JSONs, boxplot, loss curves) into results/<name>_r3/.

Usage (on the chip):  python examples/run_quality_suite.py [--only NAME]
                      [--steps-scale 0.1]   # smoke: 10% of the step budget
Env: MINIPIG_PLATFORM=cpu to dry-run the plumbing on CPU at tiny scale.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _completed_steps(log_dir: Path) -> int:
    """Steps durably checkpointed in log_dir (0 for a fresh run)."""
    import json

    f = log_dir / "checkpoints" / "last_step.json"
    if not f.exists():
        return 0
    try:
        return int(json.loads(f.read_text())["step"])
    except Exception:
        return 0

COMMON = [
    "--synthetic",
    "--set", "data.synthetic_num_pairs=80",
    "--set", "train.g_lr=2e-3",
    # batch-4-no-accum needs 18.3G HBM vs the chip's 15.75G (measured:
    # the first quality-stage attempt OOM'd at compile). accum=2 is the
    # canonical strict config bench.py runs on this chip.
    "--set", "train.accum_steps=2",
    "--set", "train.monitor_every=50",
    "--set", "train.checkpoint_every=250",
    "--set", "train.seed=0",
]

RUNS = {
    # step budgets sized from measured on-chip step cost (canonical 2.58
    # s/step, patch 1.69, noperc 1.56 — runs/q3_* metrics.jsonl): the three
    # runs fit ~4h of chip. Each run cosine-decays its LRs over its budget
    # (train.lr_decay_steps) — the fixed-LR chip-queue runs plateaued with
    # the L1 bouncing at its floor from step ~500 on.
    "canonical": dict(
        steps=2500,
        args=["--mode", "gan", "--set", "train.lr_decay_steps=2500"],
    ),
    "patch": dict(
        steps=2200,
        args=["--mode", "patch", "--set", "train.lr_decay_steps=2200"],
    ),
    "patch_noperc": dict(
        steps=2200,
        args=["--mode", "patch", "--set", "discriminator.use_perceptual=false",
              "--set", "train.lr_decay_steps=2200"],
    ),
    # Round-4 MI campaign: the canonical config on the ENRICHED fixture
    # (deep-structure blobs + T1 bias field, data/synthetic.py) where the
    # realizable-net MI ceiling sits 28% above identity (regressor 0.979 vs
    # identity 0.764 at bins=64; tpu_tests/mi_fixture_analysis.py --blobs 4
    # --bias 0.3). Checkpoint selection for this run goes through
    # examples/select_checkpoint.py on validation MI, NOT best-g_recon —
    # pass --select-metric.
    "enriched": dict(
        steps=2500,
        run_name="q4_enriched",
        out_name="enriched_r4",
        args=["--mode", "gan", "--set", "train.lr_decay_steps=2500",
              "--set", "data.synthetic_blobs=4",
              "--set", "data.synthetic_t1_bias=0.3"],
    ),
    # Seed replication of the enriched_r4 headline. train.seed seeds the
    # WHOLE pipeline (train/loop.py: make_bids_dataset(seed=train.seed),
    # split permutation, init, shuffling), so seed=1 is a fully
    # independent end-to-end draw — fresh phantom realization, fresh
    # train/val/test split, fresh training randomness — evidence the
    # 20/20 MI win is a property of the configuration, not of one seed's
    # data or initialization.
    "enriched_seed1": dict(
        steps=2500,
        run_name="q4_enriched_s1",
        out_name="enriched_s1_r4",
        args=["--mode", "gan", "--set", "train.lr_decay_steps=2500",
              "--set", "data.synthetic_blobs=4",
              "--set", "data.synthetic_t1_bias=0.3",
              "--set", "train.seed=1"],
    ),
    # The reference's perceptual A/B (GAN.py vs GAN2.py) re-run on the
    # enriched headline fixture: does the perceptual term's texture
    # sharpening pay on a fixture whose MI margin is context-carried?
    "enriched_patch": dict(
        steps=2200,
        run_name="q4_enriched_patch",
        out_name="enriched_patch_r4",
        args=["--mode", "patch", "--set", "train.lr_decay_steps=2200",
              "--set", "data.synthetic_blobs=4",
              "--set", "data.synthetic_t1_bias=0.3"],
    ),
    "enriched_patch_noperc": dict(
        steps=2200,
        run_name="q4_enriched_patch_noperc",
        out_name="enriched_patch_noperc_r4",
        args=["--mode", "patch", "--set", "discriminator.use_perceptual=false",
              "--set", "train.lr_decay_steps=2200",
              "--set", "data.synthetic_blobs=4",
              "--set", "data.synthetic_t1_bias=0.3"],
    ),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None, choices=list(RUNS) + [None])
    p.add_argument("--steps-scale", type=float, default=1.0)
    p.add_argument("--chunk-steps", type=int, default=1000,
                   help="max steps per training process (host-memory bound: "
                        "the relay client leaks ~45 MB/step at 128^3)")
    p.add_argument("--runs-dir", default=str(REPO / "runs"))
    p.add_argument("--results-dir", default=str(REPO / "results"))
    p.add_argument("--tiny", action="store_true",
                   help="16^3 volumes, 12 subjects, tiny models — CPU "
                        "plumbing dry-run")
    p.add_argument("--cpu32", action="store_true",
                   help="PROVISIONAL CPU-scale evidence: 32^3 volumes, "
                        "reduced (but non-toy) models, same 80-subject/"
                        "20-test-pair fixture and metric chain — real "
                        "trained-generator quality numbers when the TPU is "
                        "unavailable; NOT the canonical 128^3 config. "
                        "Measured ~74 s/step on this 1-core box — needs a "
                        "many-hour budget")
    p.add_argument("--extra-set", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="additional --set overrides appended after the "
                        "preset's (last one wins in the CLI)")
    p.add_argument("--select-metric", default=None,
                   help="rank retained checkpoints on the VALIDATION split "
                        "by this metric (examples/select_checkpoint.py) and "
                        "evaluate the winner, instead of best-g_recon "
                        "(e.g. mi_t2gen_vs_t2gt for the MI campaign)")
    p.add_argument("--cpu16", action="store_true",
                   help="PROVISIONAL CPU-scale evidence at 16^3 (the "
                        "1-core-budget variant of --cpu32: ~3-4 s/step, a "
                        "full 3-run suite fits in ~2-3 h); same 80-subject/"
                        "20-test-pair fixture and metric chain")
    args = p.parse_args()

    for name, spec in RUNS.items():
        if args.only and name != args.only:
            continue
        steps = max(2, int(spec["steps"] * args.steps_scale))
        log_dir = Path(args.runs_dir) / spec.get("run_name", f"q3_{name}")
        base = [sys.executable, "-m", "minipig_gan_tpu.cli.train",
                *COMMON, *spec["args"], "--log-dir", str(log_dir)]
        extra = []
        if args.cpu16:
            extra += ["--set", "data.spatial_size=16,16,16",
                    "--set", "generator.n_unet_blocks=2",
                    "--set", "generator.channels=8,16",
                    "--set", "generator.strides=2",
                    "--set", "discriminator.features=8,16,32,32",
                    "--set", "discriminator.patch_features=8,16,32,64",
                    "--set", "discriminator.patch_hidden=16",
                    "--set", "patch.roi_size=12,12,12",
                    "--set", "patch.num_samples=32",
                    "--set", "train.monitor_every=10",
                    "--set", "train.image_log_every_epochs=0",
                    "--set", "train.compute_dtype=float32"]
        if args.cpu32:
            extra += ["--set", "data.spatial_size=32,32,32",
                    "--set", "generator.n_unet_blocks=4",
                    "--set", "generator.channels=8,16,32",
                    "--set", "generator.strides=2,2",
                    "--set", "discriminator.features=16,32,64,64",
                    "--set", "discriminator.patch_features=16,32,64,128",
                    "--set", "discriminator.patch_hidden=32",
                    "--set", "patch.roi_size=12,12,12",
                    "--set", "patch.num_samples=32",
                    "--set", "train.monitor_every=10",
                    "--set", "train.compute_dtype=float32"]
        if args.tiny:
            extra += ["--set", "data.spatial_size=16,16,16",
                    "--set", "data.synthetic_num_pairs=12",
                    "--set", "generator.n_unet_blocks=1",
                    "--set", "generator.channels=2,4",
                    "--set", "generator.strides=2",
                    "--set", "discriminator.features=2,2,2,2",
                    "--set", "discriminator.patch_features=2,2,2,2",
                    "--set", "discriminator.patch_hidden=4",
                    "--set", "patch.roi_size=12,12,12",
                    "--set", "patch.num_samples=4",
                    "--set", "train.monitor_every=2",
                    "--set", "train.compute_dtype=float32"]
        for kv in args.extra_set:
            extra += ["--set", kv]
        # Chunked training: the axon relay client memoizes executions on
        # the HOST (observed: the canonical 128^3 trainer grows ~45 MB/step
        # of RSS and reaches ~113 GB by step 1500 on a 125 GB box — a 2500-
        # step single process OOMs). A fresh OS process per <=chunk steps
        # flushes the host side while orbax resume (checkpoint_every=250)
        # carries the full training state across chunks.
        print(f"=== {name}: {steps} steps -> {log_dir}", flush=True)
        done = _completed_steps(log_dir)
        first = done == 0
        while done < steps:
            target = min(steps, done + args.chunk_steps)
            cmd = base + ["--steps", str(target)] + extra
            if first:
                cmd += ["--no-resume"]
            print(f"===== chunk: steps {done} -> {target}"
                  f"{' (fresh)' if first else ' (resume)'}", flush=True)
            subprocess.run(cmd, check=True, cwd=str(REPO))
            first = False
            new_done = _completed_steps(log_dir)
            if new_done <= done:
                raise RuntimeError(
                    f"chunk made no checkpoint progress ({done} -> {new_done})")
            done = new_done

        out = Path(args.results_dir) / spec.get("out_name", f"{name}_r3")
        collect = [sys.executable, str(REPO / "examples/collect_artifacts.py"),
                   "--run", str(log_dir), "--out", str(out),
                   "--bn-recalibrate", "50"]
        if args.select_metric:
            import json as _json

            sel_cmd = [sys.executable,
                       str(REPO / "examples/select_checkpoint.py"),
                       "--run", str(log_dir), "--metric", args.select_metric,
                       "--bn-recalibrate", "50"]
            print(f"=== select ({args.select_metric}) {name}", flush=True)
            subprocess.run(sel_cmd, check=True, cwd=str(REPO))
            sel = _json.loads(
                (log_dir / "selection" / "selection.json").read_text())
            collect += ["--ckpt", sel["winner"]["checkpoint"]]
        print(f"=== collect {name} -> {out}", flush=True)
        subprocess.run(collect, check=True, cwd=str(REPO))


if __name__ == "__main__":
    main()
