"""Input-pipeline benchmark: cache-build throughput per preprocessing path.

Substantiates data/native.py's speed claim with committed numbers
(BENCH_NOTES "input pipeline" table): how fast does each path turn a
.nii.gz pair on disk into the cached, canonical-grid, [-1,1]-windowed
(128^3, 1) float32 arrays the train loop consumes?  The work per item is
the reference's 6-stage Compose (GAN_final.py:381-398): gzip NIfTI decode
-> physical trilinear resample onto the 256mm canonical grid
(transforms.py:140-147) -> 1/99-percentile window.

Paths compared (PairPreprocessor switches):
  numpy   — pure-Python fallback (data/nifti.py + ops/resample.resample_numpy)
  native  — C++ runtime (native/minipig_native.cc via ctypes): zlib inflate +
            dtype convert, threaded trilinear resample, nth_element percentile
  device  — config-4 accelerator path (--device; resample + percentile on the
            chip, Pallas separable kernel on TPU)

Box caveat: this container exposes ONE CPU core, so multi-worker scaling
cannot show here; the native path's thread-pool + GIL-free properties are
additive on real multi-core hosts. Numbers below are per-item speed.

Usage: python tpu_tests/pipeline_bench.py [--device] [--pairs N] [--shape Z Y X]
"""

import argparse
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from minipig_gan_tpu.config import DataConfig
from minipig_gan_tpu.data import native
from minipig_gan_tpu.data.pipeline import PairPreprocessor
from minipig_gan_tpu.data.structure import load_structure, structure_to_pairs
from minipig_gan_tpu.data.synthetic import make_bids_dataset


def build_fixture(root: Path, n_pairs: int, shape_zyx):
    json_path = make_bids_dataset(
        root, n_subjects=n_pairs, sessions_per_subject=1,
        shape_zyx=tuple(shape_zyx), seed=7, gzip=True,
    )
    structure = load_structure(json_path)
    pairs = []
    for split in ("train", "validation", "test"):
        pairs += structure_to_pairs(structure[split])
    return pairs[:n_pairs]


def time_path(name: str, pre: PairPreprocessor, pairs, repeats: int = 2):
    per_item = []
    for _ in range(repeats):
        for pair in pairs:
            t0 = time.perf_counter()
            out = pre(pair)
            per_item.append(time.perf_counter() - t0)
            assert out["t1w"].shape[-1] == 1
    med = statistics.median(per_item)
    print(f"{name:8s}  median {med * 1e3:8.1f} ms/pair   "
          f"{1.0 / med:6.2f} pairs/s   {2.0 / med:6.2f} vols/s")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--shape", type=int, nargs=3, default=(180, 256, 256),
                    help="source volume shape (z y x); default matches "
                    "PREDICT-HD-scale inputs")
    ap.add_argument("--device", action="store_true",
                    help="also time the config-4 accelerator path")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        print(f"fixture: {args.pairs} pairs of {tuple(args.shape)} .nii.gz "
              f"-> canonical 128^3 grid")
        pairs = build_fixture(Path(td), args.pairs, args.shape)
        cfg = DataConfig()

        t_np = time_path("numpy",
                         PairPreprocessor(cfg, use_native=False), pairs)
        t_nat = None
        if native.native_available():
            t_nat = time_path("native",
                              PairPreprocessor(cfg, use_native=True), pairs)
            print(f"native speedup vs numpy: {t_np / t_nat:.2f}x")
        else:
            print("native:   UNAVAILABLE (no toolchain)")
        if args.device:
            import jax

            pre_dev = PairPreprocessor(cfg, use_native=True, device=True)
            pre_dev(pairs[0])  # compile/warm
            t_dev = time_path(
                f"device/{jax.devices()[0].platform}", pre_dev, pairs)
            print(f"device speedup vs numpy: {t_np / t_dev:.2f}x"
                  + (f", vs native: {t_nat / t_dev:.2f}x" if t_nat else ""))


if __name__ == "__main__":
    main()
