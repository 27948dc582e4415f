"""Texture-transfer MI proxy: de-risk the GDL fine-tune bet on CPU.

The open oracle (VERDICT r3 item 2): the canonical trained run beats
identity on MAE/MSE/PSNR/SSIM but loses binned MI 0.621 vs 0.698 (oracle
0.737) — the reference's committed ordering is MI(gen,gt)=0.292 >
MI(t1,gt)=0.196 (/root/reference/code/eval/t2_gen_vs_t2_gt.xml vs
t2_gt_vs_t1_gt.xml). Mechanism hypothesis (results/README.md "Mutual
information"): L1-selected checkpoints are over-smooth — they suppress the
transferred texture, collapsing H(gen) and leaving MI low. The GDL term
(train/losses.py::gradient_difference_loss) pushes the generator to match
the TARGET's spatial gradients, i.e. to transfer texture.

This proxy asks, without any training: *if* a generator restored
high-frequency texture onto an otherwise-smooth prediction — exactly what
GDL rewards — would binned MI beat identity on the recalibrated fixture?

Stand-ins per test subject (same eval chain as the real suite: percentile
norm -> [0,255] rescale -> 64-bin joint-histogram MI):

  * identity        — the baseline to beat: MI(t1, t2);
  * smooth          — box-blurred CLEAN ORACLE: a perfect-tissue-map but
                      over-smooth generator (the trained net's failure
                      mode, flattering it with perfect low frequencies);
  * smooth + tex(a) — the same, plus a * sign-inverted T1 high-pass
                      residual (the fixture's shared texture enters T1 and
                      T2 with opposed signs, data/synthetic.py:124-127; the
                      residual also carries indep_tex + receiver-noise
                      contamination, which is the honest part of the
                      proxy). `a` is swept — a trained net learns the
                      scale from the train split, so any winning `a`
                      validates the mechanism;
  * oracle          — noise-zeroed T2 twin (perfect generator ceiling).

Also reports MAE [0,255] per stand-in: texture restoration must not break
the already-won MAE ordering (identity MAE ~7.9, oracle ~4.3).

CPU-runnable:  python tpu_tests/mi_texture_proxy.py [--n 8] [--shape 64]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def box_denoise(v: np.ndarray, radius: int = 2) -> np.ndarray:
    """Separable box blur (same as mi_fixture_analysis.py)."""
    out = v.astype(np.float64)
    k = 2 * radius + 1
    for ax in range(3):
        c = np.cumsum(np.pad(out, [(radius + 1, radius) if a == ax
                                   else (0, 0) for a in range(3)],
                             mode="edge"), axis=ax)
        out = (np.take(c, range(k, c.shape[ax]), axis=ax)
               - np.take(c, range(c.shape[ax] - k), axis=ax)) / k
    return out.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8, help="test subjects")
    p.add_argument("--shape", type=int, default=64)
    p.add_argument("--radius", type=int, default=2,
                   help="over-smoothing radius for the smooth stand-in")
    p.add_argument("--bins", type=int, default=64)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms",
                      os.environ.get("MINIPIG_PLATFORM", "cpu"))
    from minipig_gan_tpu.data.synthetic import synthetic_pair
    from minipig_gan_tpu.ops.metrics import mutual_information
    from minipig_gan_tpu.ops.percentile import (
        rescale_to_uint8_range,
        scale_intensity_range_percentiles,
    )

    def norm(v):
        return np.asarray(
            scale_intensity_range_percentiles(v, 1.0, 99.0, -1.0, 1.0))

    def u8(v):
        return np.asarray(rescale_to_uint8_range(v))

    alphas = (0.5, 1.0, 1.5, 2.0)
    shape = (args.shape,) * 3
    names = (["identity", "smooth"]
             + [f"smooth+tex({a})" for a in alphas] + ["oracle"])
    mi_rows = {k: [] for k in names}
    mae_rows = {k: [] for k in names}
    for seed in range(args.n):
        t1, t2, _meta = synthetic_pair(shape_zyx=shape, seed=seed)
        _, t2_clean, _ = synthetic_pair(shape_zyx=shape, seed=seed, noise=0.0)
        t1n, t2n, orc = norm(t1), norm(t2), norm(t2_clean)
        smooth = box_denoise(orc, args.radius)
        # sign-inverted T1 high-pass residual = recoverable shared texture
        t1_hf = t1n - box_denoise(t1n, args.radius)
        cands = {"identity": t1n, "smooth": smooth, "oracle": orc}
        for a in alphas:
            cands[f"smooth+tex({a})"] = smooth - a * t1_hf
        t8 = u8(t2n)
        for k, v in cands.items():
            v8 = u8(v)
            mi_rows[k].append(
                float(mutual_information(v8, t8, bins=args.bins)))
            mae_rows[k].append(float(np.abs(v8 - t8).mean()))

    ident_mi = np.mean(mi_rows["identity"])
    print(f"recalibrated fixture, n={args.n} shape={shape} "
          f"bins={args.bins} smooth radius={args.radius}")
    print(f"{'stand-in':>16} {'MI':>13} {'MAE[0,255]':>13}  vs identity MI")
    for k in names:
        mi = np.array(mi_rows[k])
        mae = np.array(mae_rows[k])
        beats = "WINS" if mi.mean() > ident_mi and k != "identity" else ""
        print(f"{k:>16} {mi.mean():>7.3f}±{mi.std():.3f} "
              f"{mae.mean():>7.2f}±{mae.std():.2f}  "
              f"{mi.mean() - ident_mi:>+.3f} {beats}")
    best = max((k for k in names if k.startswith("smooth+tex")),
               key=lambda k: np.mean(mi_rows[k]))
    if np.mean(mi_rows[best]) > ident_mi:
        print(f"\nVERDICT: texture restoration ({best}) beats identity MI "
              f"-> the GDL mechanism can win this oracle.")
    else:
        print("\nVERDICT: no texture-restored stand-in beats identity MI "
              "-> GDL alone is unlikely to close the gap; "
              "reconsider (entropy-richer phantom or different attack).")


if __name__ == "__main__":
    main()
