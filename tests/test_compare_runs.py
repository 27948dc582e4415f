"""Paired-A/B statistics of examples/compare_runs.py (the perceptual on/off
quality experiment tooling — reference's GAN.py vs GAN2.py ablation)."""

import importlib.util
import math
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "compare_runs",
    Path(__file__).resolve().parents[1] / "examples" / "compare_runs.py")
compare_runs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(compare_runs)


def _eval(cases):
    keys = ["mae_t2gen_vs_t2gt", "mse_t2gen_vs_t2gt", "psnr_t2gen_vs_t2gt",
            "ssim_t2gen_vs_t2gt", "mi_t2gen_vs_t2gt"]
    return {"per_case": {cid: dict(zip(keys, vals))
                         for cid, vals in cases.items()}}


def test_paired_deltas_and_wins():
    a = _eval({"c1": [1.0, 10.0, 30.0, 0.9, 0.5],
               "c2": [2.0, 20.0, 28.0, 0.8, 0.4],
               "unpaired_a": [9, 9, 9, 9, 9]})
    b = _eval({"c1": [2.0, 12.0, 29.0, 0.85, 0.45],
               "c2": [1.0, 25.0, 29.0, 0.83, 0.5],
               "unpaired_b": [9, 9, 9, 9, 9]})
    res = compare_runs.compare(a, b, "on", "off")
    assert res["n_cases"] == 2
    assert res["dropped_unpaired_cases"] == ["unpaired_a", "unpaired_b"]
    mae = res["metrics"]["MAE"]
    # deltas: c1 -1.0 (on better: lower), c2 +1.0 (off better) -> mean 0
    assert mae["paired_delta_mean"] == 0.0
    assert mae["cases_favoring_on"] == 1
    psnr = res["metrics"]["PSNR"]
    # deltas: +1.0, -1.0 -> higher-is-better, one win each
    assert psnr["cases_favoring_on"] == 1
    ssim = res["metrics"]["SSIM"]
    # deltas: +0.05, -0.03 -> mean +0.01, t positive
    assert abs(ssim["paired_delta_mean"] - 0.01) < 1e-12
    assert ssim["paired_t"] > 0
    assert ssim["cases_favoring_on"] == 1


def test_zero_variance_t_is_signed_inf():
    a = _eval({"c1": [2.0, 1, 1, 1, 1], "c2": [3.0, 1, 1, 1, 1]})
    b = _eval({"c1": [1.0, 1, 1, 1, 1], "c2": [2.0, 1, 1, 1, 1]})
    res = compare_runs.compare(a, b, "x", "y")
    mae = res["metrics"]["MAE"]
    assert mae["paired_delta_mean"] == 1.0
    assert math.isinf(mae["paired_t"]) and mae["paired_t"] > 0
    assert res["metrics"]["MSE"]["paired_t"] == 0.0


def test_render_is_markdown_table():
    a = _eval({"c1": [1, 1, 1, 1, 1]})
    res = compare_runs.compare(a, a, "on", "off")
    text = compare_runs.render(res)
    assert "| metric | on | off |" in text
    assert "MAE ↓" in text and "PSNR ↑" in text
