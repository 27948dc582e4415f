"""End-to-end slice: synthetic data -> train loop -> checkpoints/logs ->
resume -> test-set inference (+ reference-format reports) -> minipig transfer.
This is BASELINE.json config 1-2-5 wired together on CPU."""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)

from minipig_gan_tpu.config import (
    Config, DataConfig, DiscriminatorConfig, GeneratorConfig, MeshConfig,
    TrainConfig,
)


def tiny_cfg(log_dir: str) -> Config:
    return Config(
        generator=GeneratorConfig(n_unet_blocks=2, channels=(4, 8), strides=(2,)),
        discriminator=DiscriminatorConfig(features=(4, 4, 4, 4)),
        train=TrainConfig(batch_size=2, compute_dtype="float32", g_lr=1e-3,
                          d_lr=1e-4, max_steps=4, checkpoint_every=2,
                          log_every=1),
        data=DataConfig(spatial_size=(16, 16, 16), cache_num=16, num_workers=2,
                        synthetic_num_pairs=4),
        mesh=MeshConfig(data=2),
        log_dir=log_dir,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from minipig_gan_tpu.train.loop import train

    log_dir = tmp_path_factory.mktemp("run")
    cfg = tiny_cfg(str(log_dir))
    state, ckpts = train(cfg, resume=False)
    return cfg, state, ckpts, log_dir


def test_training_artifacts(trained):
    cfg, state, ckpts, log_dir = trained
    assert int(state.step) == 4
    assert (log_dir / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in (log_dir / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 4
    assert {"g_loss", "d_loss", "g_recon_loss"}.issubset(lines[-1].keys())
    # TensorBoard event file exists and is non-trivial
    events = list(log_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 100
    # checkpoints: last + at least one monitored best
    assert (log_dir / "checkpoints" / "last").exists()
    assert (log_dir / "checkpoints" / "index.json").exists()


def test_resume_continues(trained):
    from minipig_gan_tpu.train.loop import train

    cfg, state, ckpts, log_dir = trained
    state2, _ = train(cfg, resume=True, max_steps=6)
    assert int(state2.step) == 6


def test_inference_and_reports(trained):
    from minipig_gan_tpu.eval.inference import run_inference

    cfg, state, ckpts, log_dir = trained
    structure_json = str(log_dir / "synthetic_data" / "structure.json")
    out = run_inference(
        str(log_dir / "checkpoints" / "last"),
        structure_json=structure_json,
        out_dir=str(log_dir / "inference"),
        limit=1,
    )
    agg = out["aggregate"]
    for k in ("mae_t2gen_vs_t2gt", "mse_t2gen_vs_t2gt", "psnr_t2gen_vs_t2gt",
              "ssim_t2gen_vs_t2gt", "mi_t2gen_vs_t2gt", "mae_ratio_pct"):
        assert k in agg and np.isfinite(agg[k]), k
    # reference-format artifacts
    inf_dir = Path(out["out_dir"])
    assert (inf_dir / "mean_absolute_error.json").exists()
    mse = json.loads((inf_dir / "mean_squared_error.json").read_text())
    case = next(iter(mse.values()))
    assert set(case.keys()) == {"t2gen_vs_t2gt", "t2gt_vs_t2gt", "t1gt_vs_t2gt"}
    # saved NIfTIs: t1, generated, truth triplet
    names = [p.name for p in inf_dir.glob("*.nii.gz")]
    assert any("t2_inferred" in n for n in names)
    assert any("t2_truth" in n for n in names)
    # MI XML reports in the external-tool format (code/eval/*.xml)
    import xml.etree.ElementTree as ET
    for fname in ("t2_gen_vs_t2_gt.xml", "t2_gt_vs_t1_gt.xml",
                  "t2_gt_vs_t2_gt.xml"):
        root = ET.parse(inf_dir / "eval" / fname).getroot()
        assert root.tag == "measurement"
        mut = root.findall("metrics/MUTINF")
        assert len(mut) == 1  # limit=1 case
        assert np.isfinite(float(mut[0].get("value")))
    # self-MI (entropy ceiling) must dominate the cross-MI values
    self_mi = float(ET.parse(inf_dir / "eval" / "t2_gt_vs_t2_gt.xml").getroot()
                    .find("metrics/MUTINF").get("value"))
    gen_mi = float(ET.parse(inf_dir / "eval" / "t2_gen_vs_t2_gt.xml").getroot()
                   .find("metrics/MUTINF").get("value"))
    assert self_mi >= gen_mi


def test_minipig_transfer(trained):
    from minipig_gan_tpu.data.nifti import read_nifti
    from minipig_gan_tpu.eval.minipig import run_minipig_inference

    cfg, state, ckpts, log_dir = trained
    # use one synthetic T1 as the "minipig" scan (different grid policy path)
    t1_path = next((log_dir / "synthetic_data").rglob("*T1w.nii.gz"))
    out_path = run_minipig_inference(
        str(log_dir / "checkpoints" / "last"), str(t1_path),
        out_dir=str(log_dir / "minipig"),
    )
    vol, meta = read_nifti(out_path)
    assert vol.shape == tuple(cfg.data.spatial_size)
    # minipig grid keeps the native physical extent: spacing = phys/out_size
    in_vol, in_meta = read_nifti(t1_path)
    expected_spacing = (np.array(in_vol.shape[::-1]) * in_meta.spacing
                        / np.array(cfg.data.spatial_size))
    np.testing.assert_allclose(meta.spacing, expected_spacing, rtol=1e-4)


def test_monitor_save_every_parity(tmp_path_factory):
    """train.monitor_save_every defers the monitor-checkpoint decision to
    every Nth window; with monitor_exact the device-side tracker spans the
    deferred windows, so the FINAL best checkpoint per key (value and the
    argmin step in its name) must be identical to the every-window cadence."""
    import dataclasses as dc

    from minipig_gan_tpu.train.loop import train

    def run(save_every: int):
        log_dir = tmp_path_factory.mktemp(f"mse{save_every}")
        cfg = tiny_cfg(str(log_dir))
        cfg = dc.replace(cfg, train=dc.replace(
            cfg.train, max_steps=12, monitor_every=2,
            monitor_save_every=save_every, checkpoint_every=6))
        train(cfg, resume=False)
        return json.loads((log_dir / "checkpoints" / "index.json").read_text())

    idx1, idx3 = run(1), run(3)
    assert set(idx1) == set(idx3)
    for key in idx1:
        (v1, p1), (v3, p3) = idx1[key]["top"][0], idx3[key]["top"][0]
        assert v1 == pytest.approx(v3, rel=1e-6), key
        step1 = Path(p1).name.split("step=")[1].split("-")[0]
        step3 = Path(p3).name.split("step=")[1].split("-")[0]
        assert step1 == step3, (key, p1, p3)


def test_psnr_ssim_cli(trained, capsys):
    from minipig_gan_tpu.cli.psnr_ssim import main

    cfg, state, ckpts, log_dir = trained
    main([str(log_dir / "inference")])
    out = capsys.readouterr().out
    assert "Average PSNR t2 vs t2 gen:" in out
    assert "Average SSIM t2 vs t2 gen:" in out


def test_minipig_sliding_window(trained):
    """--sliding-window path: ROI-windowed generator with gaussian blending
    (the reference's dormant hook, minipig_inference.py:110-114)."""
    from minipig_gan_tpu.data.nifti import read_nifti
    from minipig_gan_tpu.eval.minipig import run_minipig_inference

    cfg, state, ckpts, log_dir = trained
    t1_path = next((log_dir / "synthetic_data").rglob("*T1w.nii.gz"))
    out_path = run_minipig_inference(
        str(log_dir / "checkpoints" / "last"), str(t1_path),
        out_dir=str(log_dir / "minipig_sw"),
        sliding_window=(8, 8, 8), sw_overlap=0.25,
    )
    vol, meta = read_nifti(out_path)
    assert vol.shape == tuple(cfg.data.spatial_size)
    assert np.isfinite(vol).all()
    # windows cover the whole volume -> no untouched voxels (output of tanh
    # generator on finite input is nonzero a.e.)
    assert np.abs(vol).max() > 0
