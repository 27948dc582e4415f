#!/usr/bin/env python
"""On-chip op-level profile of the eval forward and the canonical train step.

`jax.profiler.trace` works through the axon tunnel and is the ONLY reliable
per-op timing source on this backend (see BENCH_NOTES.md round-3: repeated
identical executions appear short-circuited, and any full-tensor fetch costs
seconds — wall-clock microbenches of single ops mislead).

Prints the device-op table aggregated by op family. Round-3 findings from
this tool: the CasNet eval forward is ~31% layout copies + ~50% elementwise
fusions at ~4x off the HBM roofline (C=16 fills 16/128 lanes); the train
step spends ~150 ms in scan dynamic-slice machinery and its arithmetic is
93% discriminator convs.

Usage: python tpu_tests/profile_step.py [fwd|step]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from minipig_gan_tpu.config import Config, TrainConfig
from minipig_gan_tpu.train import GANTrainer


def make_batch():
    rs = np.random.RandomState(0)
    t1 = np.tanh(rs.randn(4, 128, 128, 128, 1)).astype(np.float32)
    return {"t1w": jnp.asarray(t1),
            "t2w": jnp.asarray(np.clip(0.8 * t1 + 0.1, -1, 1))}


def dump(trace_dir: str, top: int = 30) -> None:
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs, cnt = collections.Counter(), collections.Counter()
    total = 0.0
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")):
            name = e.get("name", "")
            if name.startswith("jit_") or name == "while":
                continue  # outer frames double-count their children
            total += e["dur"]
            fam = re.sub(r"[.\d]+$", "", name) or name
            durs[fam] += e["dur"]
            cnt[fam] += 1
    print(f"device leaf-op time: {total/1e3:.1f} ms")
    for fam, d in durs.most_common(top):
        print(f"{d/1e3:9.2f} ms  x{cnt[fam]:5d}  {fam}")


def main(which: str) -> None:
    batch = make_batch()
    cfg = Config(train=TrainConfig(mode="gan", compute_dtype="bfloat16",
                                   batch_size=4, accum_steps=2,
                                   reuse_g_forward=True))
    tr = GANTrainer(cfg)
    state = tr.init_jit(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    out = f"/tmp/minipig_profile_{which}"
    if which == "fwd":
        f = jax.jit(tr.generate)
        y = f(state, batch["t1w"])
        y.block_until_ready()
        with jax.profiler.trace(out):
            y = f(state, batch["t1w"])
            float(np.asarray(y).ravel()[0])
    else:
        step = jax.jit(tr.train_step, donate_argnums=0)
        state, m = step(state, batch)
        float(m["g_loss"])
        with jax.profiler.trace(out):
            state, m = step(state, batch)
            float(m["g_loss"])
    dump(out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "step")
