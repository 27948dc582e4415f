#!/usr/bin/env python
"""NDHWC vs NCDHW for the CasNet's small-channel convs — on-chip A/B.

Profiling the eval CasNet forward (117 ms) shows ~31% layout copies and
~50% elementwise fusions at ~4x off the HBM roofline: with channels last
and C=16, every 128-lane vector is 87.5% empty. Channels-FIRST puts W=128
in lanes (full utilization) for all elementwise work; XLA transposes to
its conv-preferred layout internally either way.

This times an identical level-0-shaped op chain in both layouts:
  conv(1->16, k3 s2) -> affine+prelu -> conv(16->16, k3) -> affine+prelu
  -> convT(16->1, k3 s2)
repeated R times back-to-back (output 1ch re-fed), measured with the
differential (2N-N) wall-clock method bench.py uses.
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

B, S, C = 4, 128, 16
R = 30  # enough cascaded blocks to rise above the tunnel dispatch noise
N_IT = 6


def diff_time(f, x0):
    """Self-feeding differential timing: the output is the next call's
    input, so every execution has fresh args (the tunneled backend appears
    to short-circuit repeated identical (executable, args) calls)."""
    g = jax.jit(f)
    r = g(x0)
    jax.block_until_ready(r)

    def loop(n):
        r = x0
        t0 = time.time()
        for _ in range(n):
            r = g(r)
        float(r.ravel()[0])  # scalar fetch forces the chain
        return time.time() - t0

    t1 = loop(N_IT)
    t2 = loop(2 * N_IT)
    return max((t2 - t1) / N_IT, 1e-9)


def make_weights(layout):
    rs = np.random.RandomState(0)
    if layout == "NDHWC":
        w1 = rs.randn(3, 3, 3, 1, C) * 0.2    # DHWIO
        w2 = rs.randn(3, 3, 3, C, C) * 0.05
        w3 = rs.randn(3, 3, 3, C, 1) * 0.1
    else:  # NCDHW with OIDHW kernels
        w1 = rs.randn(C, 1, 3, 3, 3) * 0.2
        w2 = rs.randn(C, C, 3, 3, 3) * 0.05
        w3 = rs.randn(1, C, 3, 3, 3) * 0.1
    return [jnp.asarray(w, jnp.bfloat16) for w in (w1, w2, w3)]


def block(x, ws, dn_in, dn_k, alpha):
    w1, w2, w3 = ws
    dn = (dn_in, dn_k, dn_in)
    y = jax.lax.conv_general_dilated(
        x, w1, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=dn)
    y = jnp.where(y >= 0, y * 1.02 + 0.01, alpha * y)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn)
    y = jnp.where(y >= 0, y * 0.98 - 0.01, alpha * y)
    y = jax.lax.conv_general_dilated(
        y, w3, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=dn)
    return jnp.tanh(y.astype(jnp.float32)).astype(y.dtype)


def run(layout):
    ws = make_weights(layout)
    if layout == "NDHWC":
        x = jnp.asarray(np.random.RandomState(1).randn(B, S, S, S, 1),
                        jnp.bfloat16)
        dn_in, dn_k = "NDHWC", "DHWIO"
    else:
        x = jnp.asarray(np.random.RandomState(1).randn(B, 1, S, S, S),
                        jnp.bfloat16)
        dn_in, dn_k = "NCDHW", "OIDHW"

    def f(x):
        y = x
        for _ in range(R):
            y = block(y, ws, dn_in, dn_k, jnp.bfloat16(0.25))
        return y

    dt = diff_time(f, x)
    print(f"{layout}: {dt*1e3:8.2f} ms for {R} blocks "
          f"({dt*1e3/R:.2f} ms/block)", flush=True)
    return dt


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    a = run("NDHWC")
    b = run("NCDHW")
    print(f"NCDHW speedup: {a/b:.2f}x", flush=True)
