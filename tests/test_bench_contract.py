"""bench.py output contract (VERDICT round-2 item 1): the LAST stdout line
must be parseable JSON with the metric schema under EVERY outcome — success,
wall-clock budget exhaustion, or a dead/hung backend. Round 2 lost its
official perf artifact because the old bench retried a backend-init failure
into the driver timeout with nothing parseable emitted."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # spawns interpreters

REPO = Path(__file__).resolve().parents[1]


def run_bench(env_extra, timeout=120):
    env = dict(os.environ, **env_extra)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout)
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert lines, f"no stdout (rc={proc.returncode}, err={proc.stderr[-500:]})"
    return json.loads(lines[-1]), proc


def test_budget_exhaustion_emits_parseable_artifact():
    """A tiny budget forces the watchdog path regardless of backend health:
    the artifact line must parse and be self-describing (either a real
    measurement that finished in time, or an explicit error carrying
    last_known)."""
    parsed, _ = run_bench({"BENCH_BUDGET_S": "3"})
    assert parsed["metric"] == "train_slices_per_sec_per_chip"
    assert parsed["unit"] == "slices/s/chip"
    if parsed.get("value") is None:
        assert "error" in parsed
        lk = parsed["last_known"]
        assert lk["strict_slices_per_s_per_chip"] > 0
        assert "NOT this run" in lk["source"]
    else:  # backend was healthy and fast enough — equally valid artifact
        assert parsed["value"] > 0


def test_cpu_smoke_measures_and_emits_sol_block():
    """Tiny CPU measurement end-to-end: the emitted artifact carries the
    strict detail block and the speed-of-light fields."""
    parsed, _ = run_bench({
        "BENCH_PLATFORM": "cpu",
        "BENCH_SPATIAL": "16",
        "BENCH_STEPS": "1",
        "BENCH_BATCH": "1",
        "BENCH_ACCUM": "1",
        "BENCH_MODE": "generator_only",
        "BENCH_SEMANTICS": "strict",
        "BENCH_BUDGET_S": "560",
    }, timeout=580)
    assert parsed["value"] > 0
    assert parsed["semantics"] == "strict"
    assert parsed["strict"]["train_ms_per_step"] > 0
    sol = parsed["sol"]
    assert sol["peak_tflops_bf16"] == 197.0
    assert "architecture-bound" in sol["statement"]
