"""Oracle-floor analysis for the round-3 synthetic fixture's quality oracles.

Question it answers: on the round-3 fixture (decomposed texture + receiver
noise sigma=0.12, data/synthetic.py), what does a PERFECT generator score on
the reference's eval chain (independent [0,255] min/max rescale + round,
inferrence.py:150-162 semantics), and how much headroom do the trained
checkpoints (results/*_r3) have below their measured numbers?

Three probes per held-out test pair, all through the REAL preprocessing +
metric code (PairPreprocessor at the run's 128^3 canonical grid,
ops.metrics.evaluation_suite):

  identity     noisy T1 vs noisy T2          — the reference's baseline
                                               (cross-check vs evaluation.json)
  oracle_clean clean T2 vs noisy T2          — a perfect clean-T2 generator;
                                               its MAE is dominated by the
                                               receiver noise it cannot (and
                                               should not) predict
  oracle_pair  clean T2 + shared-texture vs
               noisy T2                      — the information-theoretic floor:
                                               everything predictable from T1
                                               (anatomy + shared texture) with
                                               only T2's independent texture
                                               and noise left as error

The clean twins are regenerated from the same per-subject seeds the fixture
writer used (make_bids_dataset: seed = train.seed*1000 + si*10 + se) with
noise/indep_tex zeroed — the RandomState draw ORDER is identical, so anatomy,
spacing jitter, and shared texture match the stored noisy volumes exactly.

Run (CPU is fine; ~20 pairs at 128^3):
    PYTHONPATH=/tmp/pypath:$PYTHONPATH python tpu_tests/oracle_floor.py \
        [--run runs/q3_canonical] [--limit N]

--sweep mode instead generates FRESH pairs at several receiver-noise levels
and prints identity vs oracle floors per level — the calibration tool that
picks a fixture noise where the reference's real-data ordering (generated
beats identity on EVERY oracle, BASELINE.md rows 1-6) is achievable at all:
    python tpu_tests/oracle_floor.py --sweep 0.12,0.06,0.03,0.02 --limit 4
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.append(str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs/q3_canonical")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default=None, help="write the summary JSON here")
    p.add_argument("--sweep", default=None,
                   help="comma-separated receiver-noise levels; fresh pairs")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from minipig_gan_tpu import config as config_mod
    from minipig_gan_tpu.data.nifti import write_nifti
    from minipig_gan_tpu.data.pipeline import PairPreprocessor
    from minipig_gan_tpu.data.structure import load_structure, split_pairs
    from minipig_gan_tpu.data.synthetic import synthetic_pair
    from minipig_gan_tpu.ops.metrics import evaluation_suite
    from minipig_gan_tpu.ops.percentile import rescale_to_uint8_range

    run = Path(args.run)
    cfg_path = run / "checkpoints" / "last" / "config.json"
    cfg = config_mod.from_json(cfg_path.read_text())

    # fixture shape the writer used (train/loop.py::build_datasets)
    shape = tuple(max(16, s // 2) for s in cfg.data.spatial_size)
    base_seed = cfg.train.seed * 1000
    pre = PairPreprocessor(cfg.data)

    def probe_case(noisy_t1_path, noisy_t2_path, seed, noise_for_clean, td):
        """One case's identity/oracle_clean/oracle_pair rows through the
        real eval chain. Clean twins regenerated from `seed`."""
        noisy = pre({"t1w": str(noisy_t1_path), "t2w": str(noisy_t2_path)})
        _, t2c, meta = synthetic_pair(shape_zyx=shape, seed=seed, noise=0.0)
        _, t2p, _ = synthetic_pair(
            shape_zyx=shape, seed=seed, noise=0.0, indep_tex=0.0)
        c_path = Path(td) / "c_T2w.nii.gz"
        p_path = Path(td) / "p_T2w.nii.gz"
        write_nifti(c_path, t2c, meta)
        write_nifti(p_path, t2p, meta)
        clean = pre({"t1w": str(c_path), "t2w": str(c_path)})
        pinfo = pre({"t1w": str(p_path), "t2w": str(p_path)})

        t1_u8 = rescale_to_uint8_range(noisy["t1w"][..., 0])
        t2_u8 = rescale_to_uint8_range(noisy["t2w"][..., 0])
        c_u8 = rescale_to_uint8_range(clean["t2w"][..., 0])
        pi_u8 = rescale_to_uint8_range(pinfo["t2w"][..., 0])

        row = {}
        for tag, res in (
            ("identity", evaluation_suite(t1_u8, t2_u8)),
            ("oracle_clean", evaluation_suite(c_u8, t2_u8)),
            ("oracle_pair", evaluation_suite(pi_u8, t2_u8)),
        ):
            row[f"mae_{tag}"] = float(res["mae_t2gen_vs_t2gt"])
            row[f"mse_{tag}"] = float(res["mse_t2gen_vs_t2gt"])
            row[f"psnr_{tag}"] = float(res["psnr_t2gen_vs_t2gt"])
            row[f"ssim_{tag}"] = float(res["ssim_t2gen_vs_t2gt"])
            row[f"mi_{tag}"] = float(res["mi_t2gen_vs_t2gt"])
        return row

    if args.sweep:
        levels = [float(s) for s in args.sweep.split(",")]
        n = args.limit or 4
        out = {}
        for noise in levels:
            rows = []
            with tempfile.TemporaryDirectory() as td:
                for si in range(n):
                    seed = base_seed + si * 10
                    t1n, t2n, meta = synthetic_pair(
                        shape_zyx=shape, seed=seed, noise=noise)
                    t1_path = Path(td) / "n_T1w.nii.gz"
                    t2_path = Path(td) / "n_T2w.nii.gz"
                    write_nifti(t1_path, t1n, meta)
                    write_nifti(t2_path, t2n, meta)
                    rows.append(probe_case(t1_path, t2_path, seed, noise, td))
            agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
            out[noise] = agg
            print(f"noise={noise}: "
                  f"mae id={agg['mae_identity']:.2f} "
                  f"clean={agg['mae_oracle_clean']:.2f} | "
                  f"ssim id={agg['ssim_identity']:.3f} "
                  f"clean={agg['ssim_oracle_clean']:.3f} | "
                  f"psnr id={agg['psnr_identity']:.2f} "
                  f"clean={agg['psnr_oracle_clean']:.2f} | "
                  f"mi id={agg['mi_identity']:.3f} "
                  f"clean={agg['mi_oracle_clean']:.3f}", flush=True)
        if args.out:
            Path(args.out).write_text(json.dumps(out, indent=1))
        return

    structure = load_structure(cfg.data.structure_json)
    pairs = split_pairs(structure)["test"]
    if args.limit:
        pairs = pairs[: args.limit]

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for i, pair in enumerate(pairs):
            m = re.search(r"sub-(\d+)_ses-(\d+)", Path(pair["t1w"]).name)
            si, se = int(m.group(1)), int(m.group(2))
            seed = base_seed + si * 10 + se
            row = {"case": Path(pair["t1w"]).name}
            row.update(probe_case(pair["t1w"], pair["t2w"], seed, None, td))
            rows.append(row)
            print(f"[{i + 1}/{len(pairs)}] {row['case']}: "
                  f"mae id={row['mae_identity']:.2f} "
                  f"clean={row['mae_oracle_clean']:.2f} "
                  f"pair={row['mae_oracle_pair']:.2f} | "
                  f"ssim id={row['ssim_identity']:.3f} "
                  f"clean={row['ssim_oracle_clean']:.3f}", flush=True)

    summary = {"n_cases": len(rows), "run": str(run), "shape_zyx": shape}
    for k in rows[0]:
        if k == "case":
            continue
        vals = np.array([r[k] for r in rows])
        summary[k] = float(vals.mean())
        summary[k + "_std"] = float(vals.std())
    print(json.dumps(summary, indent=1, sort_keys=True))
    if args.out:
        Path(args.out).write_text(
            json.dumps({"summary": summary, "cases": rows}, indent=1))


if __name__ == "__main__":
    main()
