"""Committed minipig-transfer demonstration (VERDICT r3 item 7).

The reference's cross-species capability is: identical human-trained
generator weights, different resampling grid — the minipig scan keeps its
OWN direction/physical extent and is resampled onto a native-FOV grid
(/root/reference/code/GAN/minipig_inference.py:58-128, grid policy
transforms2.py:152-165). The capability is tested (tests/test_e2e.py) but
had no committed demonstration; this script produces one:

  1. synthesize a held-out "minipig-geometry" T1 phantom — ~70 mm head
     extent (vs the human fixture's ~220 mm), anisotropic native voxels,
     ROTATED direction cosines (seed far outside the training fixture's
     subject range, so the anatomy realization is unseen);
  2. run the human-trained checkpoint through the minipig native-FOV
     inference path (cli/minipig.py machinery, BN-folded serving forward);
  3. write the input/output NIfTIs, a T1/T2clean-twin/T2gen review HTML +
     snapshot PNGs, and a MANIFEST.json recording the grid geometry the
     native-FOV policy must preserve (spacing = physical_extent/out_size,
     direction carried over).

Usage:
  python examples/minipig_demo.py --ckpt runs/q3_canonical/checkpoints/<best> \
      --out results/minipig_transfer_r4 [--sliding-window 64,64,64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parents[1]))

# minipig head: ~70 mm extent, acquisition-shaped (non-cubic) array
MINIPIG_SHAPE_ZYX = (70, 80, 64)
MINIPIG_EXTENT_MM = 70.0
MINIPIG_SEED = 424242  # far outside the fixture's subject-id range


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="human-trained checkpoint")
    p.add_argument("--out", default="results/minipig_transfer_r4")
    p.add_argument("--sliding-window", default=None, metavar="D,H,W")
    args = p.parse_args()

    import jax

    if os.environ.get("MINIPIG_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MINIPIG_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from minipig_gan_tpu.data.nifti import read_nifti, write_nifti
    from minipig_gan_tpu.data.synthetic import synthetic_pair
    from minipig_gan_tpu.eval.minipig import run_minipig_inference
    from minipig_gan_tpu.eval.report import review_html

    out = Path(args.out)
    (out / "input").mkdir(parents=True, exist_ok=True)

    # 1. held-out minipig-geometry phantom (rotate=True: non-identity
    # direction cosines — the native-FOV grid must carry them through)
    t1, t2, meta = synthetic_pair(
        shape_zyx=MINIPIG_SHAPE_ZYX, seed=MINIPIG_SEED, rotate=True,
        extent_mm=MINIPIG_EXTENT_MM,
    )
    t1_path = out / "input" / "minipig_T1w.nii.gz"
    t2_path = out / "input" / "minipig_T2w_clean_twin.nii.gz"
    write_nifti(t1_path, t1, meta)
    write_nifti(t2_path, t2, meta)
    print(f"minipig phantom: shape(zyx)={t1.shape} "
          f"spacing(xyz)={np.round(meta.spacing, 3).tolist()} mm "
          f"extent~{MINIPIG_EXTENT_MM} mm (human fixture: ~220 mm)")

    # 2. human-trained weights through the minipig native-FOV path
    roi = (tuple(int(v) for v in args.sliding_window.split(","))
           if args.sliding_window else None)
    gen_path = run_minipig_inference(
        args.ckpt, str(t1_path), out_dir=str(out),
        sliding_window=roi,
    )

    # 3. geometry assertions + manifest (the native-FOV contract:
    # spacing = physical_extent / out_size per axis, direction preserved)
    gen, gen_meta = read_nifti(gen_path)
    in_size_xyz = np.array(t1.shape[::-1], np.float64)
    out_size_xyz = np.array(gen.shape[::-1], np.float64)
    expected_spacing = in_size_xyz * np.asarray(meta.spacing) / out_size_xyz
    np.testing.assert_allclose(gen_meta.spacing, expected_spacing, rtol=1e-4)
    np.testing.assert_allclose(gen_meta.direction, meta.direction, atol=1e-6)
    manifest = {
        "checkpoint": str(args.ckpt),
        "seed": MINIPIG_SEED,
        "input_shape_zyx": list(t1.shape),
        "input_spacing_xyz_mm": [float(v) for v in meta.spacing],
        "physical_extent_mm": MINIPIG_EXTENT_MM,
        "output_shape_zyx": list(gen.shape),
        "output_spacing_xyz_mm": [float(v) for v in gen_meta.spacing],
        "direction_preserved": True,
        "sliding_window": roi,
        "generated_range": [float(gen.min()), float(gen.max())],
        "note": ("human-trained generator + minipig native-FOV grid "
                 "(minipig_inference.py:58-128 capability); geometry "
                 "asserted: spacing = extent/out_size, direction carried"),
    }
    (out / "MANIFEST.json").write_text(json.dumps(manifest, indent=2))

    # 4. visual QA page (review_html.py / slicer snapshot analogue)
    page = review_html(
        out,
        [{"name": "minipig_transfer",
          "T1w (input)": str(t1_path),
          "T2w clean twin (for the eye)": str(t2_path),
          "T2w generated": str(gen_path)}],
        title="Minipig transfer: human-trained weights, native-FOV grid",
    )
    print(f"review page: {page}")
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
