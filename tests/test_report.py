"""Reporting: aggregation math, boxplot, snapshots, HTML review gallery."""

import json
from pathlib import Path

import numpy as np

from minipig_gan_tpu.data.nifti import write_nifti
from minipig_gan_tpu.data.synthetic import synthetic_pair
from minipig_gan_tpu.eval.report import (
    boxplot_png,
    inference_review,
    load_metric_json,
    ratio_pct,
    review_html,
    snapshot_png,
    summarize,
)


def test_summarize_and_ratio():
    s = summarize([1.0, 2.0, 3.0])
    assert s["mean"] == 2.0 and s["n"] == 3
    assert abs(ratio_pct(4.365, 11.851) - 36.83) < 0.1  # the reference's 37%


def test_load_metric_json_both_formats(tmp_path):
    p1 = tmp_path / "mae.json"
    p1.write_text(json.dumps({"a": 1.0, "b": 2.0}))
    assert load_metric_json(p1) == {"a": 1.0, "b": 2.0}
    p2 = tmp_path / "mse.json"
    p2.write_text(json.dumps({"a": {"t2gen_vs_t2gt": 3.0, "t1gt_vs_t2gt": 9.0}}))
    assert load_metric_json(p2) == {"a": 3.0}


def test_boxplot(tmp_path):
    out = boxplot_png(tmp_path / "box.png", {"gen": [1, 2, 3], "ident": [4, 5, 6]},
                      title="MAE", ylabel="mae")
    if out is not None:  # matplotlib present in this env
        assert Path(out).stat().st_size > 500


def test_snapshot_png(tmp_path):
    t1, _, _ = synthetic_pair((16, 18, 20), seed=0)
    out = snapshot_png(t1, tmp_path / "snap.png")
    data = Path(out).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_review_html(tmp_path):
    t1, t2, meta = synthetic_pair((12, 12, 12), seed=1)
    p1, p2 = tmp_path / "a_T1w.nii.gz", tmp_path / "a_T2w.nii.gz"
    write_nifti(p1, t1, meta)
    write_nifti(p2, t2, meta)
    page = review_html(tmp_path, [{"name": "a", "t1w": str(p1), "t2w": str(p2)}],
                       metrics={"a": {"mae": 1.23}})
    txt = Path(page).read_text()
    assert "<html" in txt and "snapshots/0000_t1w.png" in txt and "mae=1.230" in txt


def test_inference_review_grouping(tmp_path):
    t1, t2, meta = synthetic_pair((12, 12, 12), seed=2)
    write_nifti(tmp_path / "caseA_T1w.nii.gz", t1, meta)
    write_nifti(tmp_path / "caseA_T1w_t2_inferred.nii.gz", t2, meta)
    write_nifti(tmp_path / "caseA_T2w_t2_truth.nii.gz", t2, meta)
    page = inference_review(tmp_path)
    assert page and Path(page).exists()


def test_animated_gif_roundtrip(tmp_path):
    """encode_gif produces a valid animated GIF whose decoded frames match
    the input exactly (PIL oracle) — the add_animated_gif(max_out=300)
    parity (test_runs/GAN.py:455-462)."""
    import io

    from PIL import Image

    from minipig_gan_tpu.utils.tb_writer import TBWriter, encode_gif

    rs = np.random.RandomState(0)
    frames = (rs.rand(5, 12, 16) * 255).astype(np.uint8)
    gif = encode_gif(frames, fps=10)
    im = Image.open(io.BytesIO(gif))
    assert im.format == "GIF"
    assert getattr(im, "n_frames", 1) == 5
    for i in range(5):
        im.seek(i)
        decoded = np.asarray(im.convert("L"))
        np.testing.assert_array_equal(decoded, frames[i])

    # writer path: event file grows and stays parseable (gif > header size)
    w = TBWriter(tmp_path)
    vol = rs.rand(8, 12, 16, 1).astype(np.float32) * 2 - 1
    w.animated_gif("gen/gif", vol, step=1, max_out=4)
    w.close()
    ev = list(tmp_path.glob("events.out.tfevents.*"))
    assert ev and ev[0].stat().st_size > 500


def test_loss_curve_png(tmp_path):
    import json

    from minipig_gan_tpu.eval.report import loss_curve_png

    mj = tmp_path / "metrics.jsonl"
    rows = [{"step": i, "g_recon_loss": 1.0 / (i + 1), "g_loss": 2.0,
             "d_loss": 0.5} for i in range(50)]
    mj.write_text("\n".join(json.dumps(r) for r in rows))
    out = loss_curve_png(mj, tmp_path / "loss.png")
    if out is not None:  # matplotlib present
        assert (tmp_path / "loss.png").stat().st_size > 1000


def test_mi_xml_report_format(tmp_path):
    """mi_xml_report emits the reference ImageCompare XML structure
    (code/eval/t2_gen_vs_t2_gt.xml): flat fixed/moving/metrics/time/dimention
    records under one <measurement> root."""
    import xml.etree.ElementTree as ET

    from minipig_gan_tpu.eval.report import mi_xml_report

    entries = [
        {"fixed": "/x/t2_truth_a.nii.gz", "moving": "/x/t2_inferred_a.nii.gz",
         "value": 0.292, "fixed_nonzero": 124104, "moving_nonzero": 28597,
         "intersection": 520719, "ms": 742, "shape": (128, 128, 128)},
        {"fixed": "/x/t2_truth_b.nii.gz", "moving": "/x/t2_inferred_b.nii.gz",
         "value": 0.3017, "fixed_nonzero": 10, "moving_nonzero": 5,
         "intersection": 12, "ms": 600, "shape": (128, 128, 128)},
    ]
    out = mi_xml_report(entries, tmp_path / "t2_gen_vs_t2_gt.xml")
    root = ET.parse(out).getroot()
    assert root.tag == "measurement"
    fixed = root.findall("fixed-image")
    moving = root.findall("moving-image")
    mut = root.findall("metrics/MUTINF")
    dim = root.findall("dimention")  # sic — the reference tool's spelling
    times = root.findall("time")
    assert len(fixed) == len(moving) == len(mut) == len(dim) == len(times) == 2
    assert fixed[0].get("filename") == "/x/t2_truth_a.nii.gz"
    assert fixed[0].get("nonzeropoints") == "124104"
    assert fixed[0].get("intersection") == "520719"
    assert mut[0].get("name") == "Mutual Information"
    assert mut[0].get("symbol") == "MUTINF"
    assert mut[0].get("type") == "similarity"
    assert abs(float(mut[0].get("value")) - 0.292) < 1e-9
    assert dim[0].get("max_x") == "127"
    assert dim[0].get("voxelspacing_x") == "2.000000"
    assert times[0].get("total-executiontime") == "742"
