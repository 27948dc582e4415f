#!/usr/bin/env python
"""Global discriminator: VALID convs vs SAME+crop on the real chip.

The D carries 93% of the canonical step's FLOPs (BENCH_NOTES round-3) and
its stride-1 VALID convs produce odd extents (126^3, 124^3) that pad every
(8,128) tile. Cropping the interior of a zero-padded SAME conv is EXACTLY
the VALID result (the dropped border rows are the only ones touching pad
zeros), but the conv itself runs on aligned 128^3 extents.

Times the 4-block D forward both ways, batch 4 bf16, with the
state-mutating loop pattern (fresh args each call — see BENCH_NOTES on the
tunneled backend's identical-call short-circuit).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

N_IT = 8
SPECS = [(64, 3, 1), (128, 3, 1), (256, 4, 2), (256, 4, 2)]


def make_ws():
    rs = np.random.RandomState(0)
    ws = []
    cin = 1
    for cout, k, s in SPECS:
        ws.append(jnp.asarray(
            rs.randn(k, k, k, cin, cout) / np.sqrt(cin * k**3), jnp.bfloat16))
        cin = cout
    return ws


def d_fwd(x, ws, same_crop: bool):
    for w, (cout, k, s) in zip(ws, SPECS):
        if same_crop and s == 1:
            # SAME-pad to keep the aligned input extent, then crop the
            # border back off: exactly the VALID output.
            p = (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                x, w, (s,) * 3, [(p, p)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            x = y[:, p:-p or None, p:-p or None, p:-p or None, :]
        else:
            x = jax.lax.conv_general_dilated(
                x, w, (s,) * 3, [(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        x = jnp.where(x >= 0, x, 0.2 * x)
    return x


def bench(name, same_crop, ws):
    rs = np.random.RandomState(1)
    x0 = jnp.asarray(rs.randn(4, 128, 128, 128, 1), jnp.bfloat16)

    @jax.jit
    def f(x, t):
        # fold the iteration counter into the input so every call is unique
        return d_fwd(x + t * jnp.bfloat16(1e-6), ws, same_crop), t + 1

    y, _ = f(x0, jnp.bfloat16(0))
    y.block_until_ready()

    def loop(n):
        t = jnp.bfloat16(0)
        t0 = time.time()
        for _ in range(n):
            y, t = f(x0, t)
        float(jnp.ravel(y)[0])
        return time.time() - t0

    dt = max((loop(2 * N_IT) - loop(N_IT)) / N_IT, 1e-9)
    flops = 0.0
    sp, cin = [128] * 3, 1
    for cout, k, s in SPECS:
        sp = [(d - k) // s + 1 for d in sp]
        flops += 2 * 4 * sp[0] * sp[1] * sp[2] * cin * cout * k**3
        cin = cout
    print(f"{name}: {dt*1e3:7.1f} ms  {flops/dt/1e12:5.1f} TF/s", flush=True)
    return d_fwd(x0, ws, same_crop)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    ws = make_ws()
    a = bench("VALID   ", False, ws)
    b = bench("SAME+crop", True, ws)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |diff| = {err} (must be 0.0 — exact rewrite)", flush=True)
