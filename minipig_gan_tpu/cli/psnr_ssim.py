"""Offline PSNR/SSIM over a directory of saved inference NIfTIs —
psnr_ssim_metric.py:47-106 replacement (same grouping: files containing
"truth" are T2 ground truth, "inferred" are generated, the rest T1), with the
metrics computed on device (data_range=256)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.nifti import read_nifti
from ..ops.metrics import psnr, ssim3d


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", help="directory of rescaled inference NIfTIs")
    parser.add_argument("--data-range", type=float, default=256.0)
    args = parser.parse_args(argv)

    t1_gt, t2_gen, t2_gt = [], [], []
    for p in sorted(Path(args.data_dir).glob("*")):
        s = str(p)
        if not (s.endswith(".nii") or s.endswith(".nii.gz")):
            continue
        if "truth" in s:
            t2_gt.append(s)
        elif "inferred" in s:
            t2_gen.append(s)
        else:
            t1_gt.append(s)
    n = min(len(t1_gt), len(t2_gt), len(t2_gen))
    if n == 0:
        raise SystemExit(f"no grouped volumes found in {args.data_dir}")
    print(n)

    fn = jax.jit(lambda a, b: (psnr(a, b, args.data_range),
                               ssim3d(a, b, args.data_range)))
    sums = np.zeros(4)
    for i in range(n):
        t1 = jnp.asarray(read_nifti(t1_gt[i])[0])
        t2 = jnp.asarray(read_nifti(t2_gt[i])[0])
        gen = jnp.asarray(read_nifti(t2_gen[i])[0])
        p1, s1 = fn(t2, t1)
        p2, s2 = fn(t2, gen)
        sums += np.array([float(p1), float(p2), float(s1), float(s2)])
    avg = sums / n
    print(f"Average PSNR t2 vs t1: {avg[0]}")
    print(f"Average PSNR t2 vs t2 gen: {avg[1]}")
    print(f"Average SSIM t2 vs t1: {avg[2]}")
    print(f"Average SSIM t2 vs t2 gen: {avg[3]}")


if __name__ == "__main__":
    main()
