"""Round-4 MI diagnostic: does serving-time INTENSITY CALIBRATION (a
conditional-mean LUT fitted on train-split outputs) close the MI gap?

Evidence chain so far (ordered, each step committed):
  * oracle floor (results/oracle_floor_r3.json): through the official eval
    chain the net BEATS the clean oracle on MAE/MSE/PSNR/SSIM
    (2.42/18.6/35.5/0.92 vs 4.26/20.7/35.1/0.37) yet LOSES binned MI
    (0.621 vs 0.737, identity 0.698) — equal-magnitude errors, very
    different MI, so the deficit is the SHAPE of the conditional
    p(gt | gen), not its width;
  * train-split eval (/tmp/mi_train_diag.log): MI(gen)=0.618 on TRAIN vs
    0.621 on test — NO generalization gap through the eval chain, so more
    training subjects cannot win this (refuting the round-4 fine-tune's
    premise; that run indeed degraded val MI 0.617 -> 0.609);
  * the remaining candidate: intensity-dependent conditional bias — for a
    given generator output value, E[gt | gen] drifts away from the
    diagonal differently in different intensity regimes, which widens the
    64-bin joint histogram's conditionals without adding much MSE.

If that candidate is right, a 256-entry LUT gen -> E[gt | gen] fitted on
TRAIN subjects and applied at serving (the intensity analogue of the
landed BN-recalibration pass; cf. Nyul & Udupa intensity standardization)
should recover a large share of the gap on VALIDATION subjects. The
self-fit ceiling (LUT fitted on the evaluated case itself) bounds what any
intensity-only correction can do; if even that ceiling stays below
identity MI, the residual is spatial and the attack is dead.

Protocol: train + validation splits only; the held-out test split is not
touched (it is spent once, by the final collect_artifacts of whatever
method wins validation).

Usage (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tpu_tests/mi_remap_diag.py [--run runs/q3_canonical] [--n 20]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def binned_mi(a: np.ndarray, b: np.ndarray, bins: int = 64,
              vmax: float = 256.0) -> float:
    """numpy twin of ops.metrics.mutual_information (floor-binned, nats)."""
    scale = bins / vmax
    ia = np.clip((a.reshape(-1) * scale).astype(np.int64), 0, bins - 1)
    ib = np.clip((b.reshape(-1) * scale).astype(np.int64), 0, bins - 1)
    h = np.bincount(ia * bins + ib, minlength=bins * bins).astype(np.float64)
    p = h.reshape(bins, bins) / h.sum()
    px = p.sum(axis=1, keepdims=True)
    py = p.sum(axis=0, keepdims=True)
    m = p > 0
    return float(np.sum(p[m] * np.log(p[m] / (px * py + 1e-300)[m])))


def fit_lut(gen_list, gt_list) -> np.ndarray:
    """256-entry conditional-mean LUT: lut[v] = mean(gt | round(gen) == v),
    empty bins filled by linear interpolation over populated ones."""
    sums = np.zeros(256)
    counts = np.zeros(256)
    for gen, gt in zip(gen_list, gt_list):
        gi = np.clip(gen.reshape(-1).astype(np.int64), 0, 255)
        sums += np.bincount(gi, weights=gt.reshape(-1), minlength=256)
        counts += np.bincount(gi, minlength=256)
    pop = counts > 0
    lut = np.arange(256, dtype=np.float64)
    lut[pop] = sums[pop] / counts[pop]
    if pop.sum() >= 2:
        xi = np.flatnonzero(pop)
        lut[~pop] = np.interp(np.flatnonzero(~pop), xi, lut[xi])
    return lut


def apply_lut(gen: np.ndarray, lut: np.ndarray) -> np.ndarray:
    gi = np.clip(gen.astype(np.int64), 0, 255)
    return np.rint(lut[gi]).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/q3_canonical")
    ap.add_argument("--ckpt", default=None,
                    help="default: the gen_recon monitor checkpoint")
    ap.add_argument("--n", type=int, default=20, help="cases per split")
    ap.add_argument("--out", default="/tmp/mi_remap_diag.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from minipig_gan_tpu.data.pipeline import PairPreprocessor
    from minipig_gan_tpu.data.structure import load_structure, structure_to_pairs
    from minipig_gan_tpu.eval.inference import load_trainer_state
    from minipig_gan_tpu.ops.percentile import rescale_to_uint8_range
    from minipig_gan_tpu.train.checkpoints import load_config

    run = Path(args.run)
    ckpt = Path(args.ckpt) if args.ckpt else next(
        p for p in (run / "checkpoints").iterdir()
        if p.name.startswith("gen_recon_step="))
    print(f"checkpoint: {ckpt}")
    trainer, state = load_trainer_state(ckpt)
    cfg = load_config(ckpt)
    fast = trainer.make_fast_generator(state)
    pre = PairPreprocessor(cfg.data)
    structure = load_structure(cfg.data.structure_json)

    def cases(split: str):
        pairs = structure_to_pairs(structure.get(split, {}))[: args.n]
        out = []
        for pair in pairs:
            item = pre(pair)
            g = fast(jnp.asarray(item["t1w"][None]))[0, ..., 0]
            gen = np.asarray(rescale_to_uint8_range(g))
            gt = np.asarray(rescale_to_uint8_range(
                jnp.asarray(item["t2w"][..., 0])))
            t1 = np.asarray(rescale_to_uint8_range(
                jnp.asarray(item["t1w"][..., 0])))
            out.append((Path(pair["t1w"]).name.split(".")[0], gen, gt, t1))
        return out

    train = cases("train")
    val = cases("validation")
    lut = fit_lut([c[1] for c in train], [c[2] for c in train])

    rows = []
    for key, gen, gt, t1 in val:
        self_lut = fit_lut([gen], [gt])
        remapped = apply_lut(gen, lut)
        rows.append({
            "case": key,
            "mi_identity": binned_mi(t1, gt),
            "mi_raw": binned_mi(gen, gt),
            "mi_remap": binned_mi(remapped, gt),
            "mi_selffit": binned_mi(apply_lut(gen, self_lut), gt),
            "mae_raw": float(np.abs(gen - gt).mean()),
            "mae_remap": float(np.abs(remapped - gt).mean()),
        })
        r = rows[-1]
        print(f"{key}: identity={r['mi_identity']:.4f} raw={r['mi_raw']:.4f} "
              f"remap={r['mi_remap']:.4f} selffit={r['mi_selffit']:.4f} "
              f"mae {r['mae_raw']:.2f}->{r['mae_remap']:.2f}")

    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]
           if k != "case"}
    wins = {k: sum(r[k] > r["mi_identity"] for r in rows)
            for k in ("mi_raw", "mi_remap", "mi_selffit")}
    print("\naggregate:", json.dumps(agg, indent=1))
    print("cases beating identity MI:", wins, f"of n={len(rows)}")
    Path(args.out).write_text(json.dumps(
        {"aggregate": agg, "wins": wins, "rows": rows,
         "lut": lut.tolist(), "checkpoint": str(ckpt)}, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
