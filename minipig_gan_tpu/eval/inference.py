"""Human test-set inference + on-device evaluation.

Reproduces the reference's eval stack in one pass (the reference spreads it
over three scripts that each redo the preprocessing):
  * /root/reference/code/GAN/inferrence.py — load checkpoint, preprocess test
    pairs, generator forward under no-grad, save T1/T2gt/T2gen as [0,255]
    rounded NIfTIs, print per-case MAE;
  * code/GAN/metrics.py:142-223 — per-case MSE triplets {t2gen_vs_t2gt,
    t2gt_vs_t2gt, t1gt_vs_t2gt} -> mean_squared_error.json;
  * code/GAN/psnr_ssim_metric.py:82-106 — PSNR/SSIM (data_range=256)
    averages for T2gen and the T1 identity baseline;
  * code/eval/*.xml — per-pair mutual information.

All metrics run jit-compiled on device from a single preprocessing pass.
Intensity convention for metrics/saves matches the reference: each volume is
INDEPENDENTLY min/max rescaled to [0, 255] and rounded
(ScaleIntensityRangePercentilesd(0, 100, 0, 255, clip) + round,
inferrence.py:150-162,188-199).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.nifti import write_nifti
from ..data.pipeline import PairPreprocessor
from ..data.structure import load_structure, structure_to_pairs
from ..ops.metrics import evaluation_suite
from ..ops.percentile import rescale_to_uint8_range
from ..train.checkpoints import load_config, restore_state
from ..train.gan import GANTrainer, GANTrainState


def load_trainer_state(ckpt_path, cfg: Optional[Config] = None
                       ) -> Tuple[GANTrainer, GANTrainState]:
    """Rebuild the trainer from the checkpoint's persisted config (the
    hparams.yaml analogue, inferrence.py:97-106) and restore the full state."""
    ckpt_path = Path(ckpt_path)
    if cfg is None:
        cfg = load_config(ckpt_path)
    trainer = GANTrainer(cfg)
    spatial = tuple(cfg.data.spatial_size)
    dummy = {
        "t1w": jnp.zeros((cfg.train.batch_size, *spatial, 1), jnp.float32),
        "t2w": jnp.zeros((cfg.train.batch_size, *spatial, 1), jnp.float32),
    }
    abstract = jax.eval_shape(trainer.init, jax.random.PRNGKey(0), dummy)
    state = restore_state(ckpt_path, abstract)
    return trainer, state


def _case_out_path(out_dir: Path, src_path: str, postfix: str) -> Path:
    """SaveITKImaged naming (transforms2.py:98-117):
    {out_dir}/{basename}_{postfix}.{ext}."""
    name = Path(src_path).name
    base = name.split(".")[0]
    ext = ".".join(name.split(".")[-2:]) if name.endswith(".gz") else name.split(".")[-1]
    return out_dir / f"{base}_{postfix}.{ext}"


def _save_case(out_dir: Path, src_path: str, postfix: str, vol_zyx: np.ndarray,
               grid_meta) -> str:
    out = _case_out_path(out_dir, src_path, postfix)
    write_nifti(out, vol_zyx, grid_meta)
    return str(out)


def run_inference(
    ckpt_path,
    structure_json: Optional[str] = None,
    out_dir: Optional[str] = None,
    cfg: Optional[Config] = None,
    limit: Optional[int] = None,
    save_volumes: bool = True,
    split: str = "test",
    bn_recalib_batches: int = 0,
) -> Dict:
    """Run the full test-set inference + metric report. Returns the report
    dict (also written to {out_dir}/evaluation.json + the two
    reference-format files mean_absolute_error.json / mean_squared_error.json).
    """
    trainer, state = load_trainer_state(ckpt_path, cfg)
    cfg = cfg or load_config(Path(ckpt_path))
    structure_json = structure_json or cfg.data.structure_json
    pairs = structure_to_pairs(load_structure(structure_json).get(split, {}))
    if limit:
        pairs = pairs[:limit]
    if not pairs:
        raise ValueError(f"no {split} pairs in {structure_json}")
    out_dir = Path(out_dir or Path(cfg.log_dir) / "inference")
    out_dir.mkdir(parents=True, exist_ok=True)

    pre = PairPreprocessor(cfg.data)
    if bn_recalib_batches:
        # serving-time BN recalibration (GANTrainer.recalibrate_bn_stats):
        # replay train-split inputs at the TRAINING batch size to refresh
        # the generator's running stats before folding them into the convs.
        train_pairs = structure_to_pairs(
            load_structure(structure_json).get("train", {}))
        if not train_pairs:
            raise ValueError(
                "bn_recalib_batches needs a train split in the structure")
        bs = max(1, int(cfg.train.batch_size))

        def _batches():
            idx = 0
            for _ in range(int(bn_recalib_batches)):
                items = []
                for _ in range(bs):
                    items.append(pre(train_pairs[idx % len(train_pairs)])
                                 ["t1w"])
                    idx += 1
                yield np.stack(items)

        t0 = time.time()
        state = trainer.recalibrate_bn_stats(state, _batches())
        print(f"# BN recalibration: {bn_recalib_batches} train batches "
              f"(bs={bs}) in {time.time() - t0:.1f}s")
    # BN-folded eval generator (models/fold.py): one fewer full-res
    # elementwise pass per conv; falls back to the stats-threading forward
    # for architectures the folder doesn't know.
    try:
        fast_gen = trainer.make_fast_generator(state)
        generate = lambda _state, t1: fast_gen(t1)  # noqa: E731
    except Exception as e:  # pragma: no cover — non-foldable variant
        print(f"# BN folding unavailable ({e!r}); using unfolded forward")
        generate = jax.jit(trainer.generate)

    @jax.jit
    def eval_case(t2_gen_n, t2_gt_n, t1_n):
        # independent [0,255] rescale + round, then the full metric suite
        gen = rescale_to_uint8_range(t2_gen_n)
        gt = rescale_to_uint8_range(t2_gt_n)
        t1 = rescale_to_uint8_range(t1_n)
        return evaluation_suite(gen, gt, t1), (gen, gt, t1)

    per_case: Dict[str, Dict[str, float]] = {}
    mi_entries: Dict[str, List[Dict]] = {k: [] for k in
                                         ("gen", "identity", "self")}
    # Pipelined serving loop: host preprocessing (NIfTI read + resample +
    # percentile window) runs in a thread pool a bounded window AHEAD of the
    # device, and NIfTI writes are submitted behind it — the accelerator
    # never waits on file IO. The reference's loop is fully sequential
    # (inferrence.py:147-204); CacheDataset hid the cost only after a full
    # first epoch.
    import collections
    from concurrent.futures import ThreadPoolExecutor

    n_workers = max(1, min(int(cfg.data.num_workers), 4))
    pool = ThreadPoolExecutor(n_workers + 1)
    pairs_it = iter(pairs)
    window: "collections.deque" = collections.deque()
    for p in pairs[: n_workers + 1]:
        next(pairs_it)
        window.append((p, pool.submit(pre, p, keep_meta=True)))
    save_futures: List = []

    i = -1
    while window:
        i += 1
        pair, fut = window.popleft()
        item = fut.result()
        nxt = next(pairs_it, None)
        if nxt is not None:
            window.append((nxt, pool.submit(pre, nxt, keep_meta=True)))
        t1 = jnp.asarray(item["t1w"][None])  # (1, D, H, W, 1)
        t2_gen = generate(state, t1)[0, ..., 0]
        t2_gt = jnp.asarray(item["t2w"][..., 0])
        t_case0 = time.time()
        metrics, (gen_u8, gt_u8, t1_u8) = eval_case(
            t2_gen, t2_gt, jnp.asarray(item["t1w"][..., 0])
        )
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        case_ms = (time.time() - t_case0) * 1e3
        case_key = Path(pair["t1w"]).name.split(".")[0]
        per_case[case_key] = metrics
        print(f"[{i+1}/{len(pairs)}] {case_key}: "
              f"mae={metrics['mae_t2gen_vs_t2gt']:.3f} "
              f"mse={metrics['mse_t2gen_vs_t2gt']:.2f} "
              f"psnr={metrics['psnr_t2gen_vs_t2gt']:.2f} "
              f"ssim={metrics['ssim_t2gen_vs_t2gt']:.4f}")
        gen_np, gt_np, t1_np = (np.asarray(gen_u8), np.asarray(gt_u8),
                                np.asarray(t1_u8))
        t1_path = gen_path = gt_path = ""
        if save_volumes:
            grid_meta = item["grid_meta"]
            t1_path = str(_case_out_path(out_dir, pair["t1w"], ""))
            gen_path = str(_case_out_path(out_dir, pair["t1w"], "t2_inferred"))
            gt_path = str(_case_out_path(out_dir, pair["t2w"], "t2_truth"))
            for path, vol in ((t1_path, t1_np), (gen_path, gen_np),
                              (gt_path, gt_np)):
                save_futures.append(
                    pool.submit(write_nifti, Path(path), vol, grid_meta))
        # per-pair MI records for the ImageCompare-format XML reports
        # (code/eval/{t2_gen_vs_t2_gt,t2_gt_vs_t1_gt,t2_gt_vs_t2_gt}.xml)
        nz = {"gen": int(np.count_nonzero(gen_np)),
              "gt": int(np.count_nonzero(gt_np)),
              "t1": int(np.count_nonzero(t1_np))}
        shape = tuple(gt_np.shape)
        for name, moving_path, moving_nz, mi_key in (
            ("gen", gen_path, nz["gen"], "mi_t2gen_vs_t2gt"),
            ("identity", t1_path, nz["t1"], "mi_t1gt_vs_t2gt"),
            ("self", gt_path, nz["gt"], "mi_t2gt_vs_t2gt"),
        ):
            mv = gen_np if name == "gen" else (t1_np if name == "identity"
                                               else gt_np)
            mi_entries[name].append({
                "fixed": gt_path or f"{case_key}_t2_truth",
                "moving": moving_path or f"{case_key}_{name}",
                "value": metrics[mi_key],
                "fixed_nonzero": nz["gt"],
                "moving_nonzero": moving_nz,
                "intersection": int(np.count_nonzero((gt_np != 0) | (mv != 0))),
                "ms": case_ms / 3.0,
                "shape": shape,
                # canonical grid spacing = FOV / size (2.0 mm at 128^3/256mm,
                # matching the reference XMLs' voxelspacing)
                "spacing": tuple(cfg.data.fov_mm / s for s in shape),
            })

    for f in save_futures:  # surface any writer-thread error
        f.result()
    pool.shutdown()

    report = aggregate_report(per_case)
    (out_dir / "evaluation.json").write_text(json.dumps(
        {"per_case": per_case, "aggregate": report}, indent=2))
    # reference-format files (plot_mae.py / average_mse.py consume these)
    mae_json = {k: v["mae_t2gen_vs_t2gt"] for k, v in per_case.items()}
    (out_dir / "mean_absolute_error.json").write_text(json.dumps(mae_json))
    mse_json = {
        k: {
            "t2gen_vs_t2gt": v["mse_t2gen_vs_t2gt"],
            "t2gt_vs_t2gt": 0.0,
            "t1gt_vs_t2gt": v["mse_t1gt_vs_t2gt"],
        }
        for k, v in per_case.items()
    }
    (out_dir / "mean_squared_error.json").write_text(json.dumps(mse_json))
    # MI XML reports in the reference's external-tool format (code/eval/)
    from .report import mi_xml_report

    eval_dir = out_dir / "eval"
    for name, fname in (("gen", "t2_gen_vs_t2_gt.xml"),
                        ("identity", "t2_gt_vs_t1_gt.xml"),
                        ("self", "t2_gt_vs_t2_gt.xml")):
        mi_xml_report(mi_entries[name], eval_dir / fname)
    print(json.dumps(report, indent=2))
    return {"per_case": per_case, "aggregate": report, "out_dir": str(out_dir)}


def aggregate_report(per_case: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    """Mean over cases + gen/identity ratios x100 (plot_mae.py:10-21,
    average_mse.py:10-21 semantics; lower ratio = better). Also reports the
    across-case standard deviation (`{k}_std`) and the case count — quality
    claims need variance, not just point estimates (the reference aggregates
    462 pairs; small-fixture runs must show their spread)."""
    if not per_case:
        return {}
    keys = next(iter(per_case.values())).keys()
    vals = {k: np.asarray([c[k] for c in per_case.values()], np.float64)
            for k in keys}
    agg = {k: float(v.mean()) for k, v in vals.items()}
    out = dict(agg)
    out.update({f"{k}_std": float(v.std(ddof=1)) if v.size > 1 else 0.0
                for k, v in vals.items()})
    out["n_cases"] = len(per_case)
    for m in ("mae", "mse"):
        gen = agg.get(f"{m}_t2gen_vs_t2gt")
        ident = agg.get(f"{m}_t1gt_vs_t2gt")
        if gen is not None and ident:
            out[f"{m}_ratio_pct"] = 100.0 * gen / ident
            # per-case ratio spread (the reference's boxplot quantity,
            # plot_mae.py:14)
            per_ratio = 100.0 * vals[f"{m}_t2gen_vs_t2gt"] / np.maximum(
                vals[f"{m}_t1gt_vs_t2gt"], 1e-12)
            out[f"{m}_ratio_pct_std"] = (
                float(per_ratio.std(ddof=1)) if per_ratio.size > 1 else 0.0)
    return out
