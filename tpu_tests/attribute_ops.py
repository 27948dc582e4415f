#!/usr/bin/env python
"""Map hot op names from the step trace (profile_step.py) to their HLO.

Compiles the canonical step (cache-warm after profile_step.py), dumps the
optimized HLO, and prints the instruction + called-computation root for each
requested op name, so trace lines like `fusion.2700  74 ms` become
attributable ("D block0 weight-grad conv", "BN stats convert+reduce", ...).

Usage: python tpu_tests/attribute_ops.py fusion.2700 select_add_fusion.162 ...
"""

from __future__ import annotations

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


def main(names):
    rs = np.random.RandomState(0)
    t1 = np.tanh(rs.randn(4, 128, 128, 128, 1)).astype(np.float32)
    batch = {"t1w": jnp.asarray(t1),
             "t2w": jnp.asarray(np.clip(0.8 * t1 + 0.1, -1, 1))}
    cfg = Config(train=TrainConfig(mode="gan", compute_dtype="bfloat16",
                                   batch_size=4, accum_steps=2,
                                   reuse_g_forward=True))
    tr = GANTrainer(cfg)
    state = tr.init_jit(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(jax.tree.leaves(state.g_params)[0])
    step = jax.jit(tr.train_step, donate_argnums=0).lower(state, batch).compile()
    txt = step.as_text()
    Path("/tmp/step_hlo.txt").write_text(txt)
    print(f"HLO dumped: /tmp/step_hlo.txt ({len(txt)/1e6:.1f} MB)", flush=True)

    # index computation definitions
    comp_lines = {}  # name -> [lines]
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> ", line)
        if m:
            cur = m.group(1)
            comp_lines[cur] = []
        elif cur is not None and line.strip():
            comp_lines[cur].append(line.rstrip())

    for want in names:
        pat = re.compile(rf"%?{re.escape(want)} = ")
        hits = [l for l in txt.splitlines() if pat.search(l)]
        print(f"\n===== {want} =====")
        for h in hits[:2]:
            h = h.strip()
            print(h[:400])
            m = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", h)
            if m and m.group(1) in comp_lines:
                body = comp_lines[m.group(1)]
                print(f"  -- {m.group(1)} ({len(body)} instrs):")
                interesting = [b for b in body if re.search(
                    r"convolution|dot|reduce|convert|select|rsqrt|divide|"
                    r"power|compare|dynamic", b)]
                for b in (interesting or body)[:12]:
                    print("   ", b.strip()[:240])


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "convert_reduce_fusion.51", "fusion.2700",
        "multiply_reduce_fusion.18", "multiply_reduce_fusion.19",
        "select_add_fusion.162", "select_add_fusion.164",
        "fusion.2652", "fusion.2653", "fusion.3000",
        "constant_dynamic-update-slice_fusion.179",
        "broadcast_select_fusion.40", "add_add_fusion.23",
        "fusion.2702", "fusion.2646", "fusion.2644",
        "broadcast_minimum_fusion.2", "copy.2426", "copy.2406",
    ])
