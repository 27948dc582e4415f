"""Calibrate the PRACTICAL HBM bandwidth ceiling of this chip.

The nonconv_budget roofline uses the v5e paper peak (819 GB/s), but no
real kernel reaches spec: the honest "speed-of-light" denominator is what
an ideal, perfectly-laid-out streaming op actually achieves. This measures
three canonical shapes with the same differential fori-loop timing as the
step benches (tunnel-safe):

  copy    — y = x + 0        (read N + write N)
  saxpy   — y = a*x + y      (read 2N + write N)
  reduce  — s = sum(x)       (read N)

on big bf16/f32 buffers whose minor dim is 128-multiple (zero tile
padding). The best achieved GB/s is the calibration constant to quote as
"practical peak" in BENCH_NOTES' roofline table.
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(fn, x, n_inner=30, reps=5):
    """Differential timing: run fn chained n_inner times inside one jit.

    Two on-chip gotchas this has to defend against (both observed on the
    axon relay, round 6 — each alone makes the differential collapse to
    noise and the GB/s print garbage):

    1. XLA algebraically folds chained bodies (30 x `v+1` -> `v+30`), so
       every iteration is wrapped in `lax.optimization_barrier` (which also
       blocks DCE/slice-narrowing through the chain — required because of
       point 2).
    2. `block_until_ready()` does NOT synchronize through the relay, and
       identical (executable, args) executions are served from a cache, so
       timing the full-array result measures dispatch latency only. The
       jitted program therefore returns a SCALAR derived from the final
       carry and the timer syncs via host fetch (`float(...)`), the one
       operation that provably waits for device completion here. bench.py's
       step timers sync the same way (they fetch the loss).
    """

    def body(i, v):
        return jax.lax.optimization_barrier(fn(v))

    @jax.jit
    def loop(x):
        out = jax.lax.fori_loop(0, n_inner, body, x)
        return jnp.sum(out[:1, :1], dtype=jnp.float32)

    @jax.jit
    def loop1(x):
        out = jax.lax.fori_loop(0, 1, body, x)
        return jnp.sum(out[:1, :1], dtype=jnp.float32)

    float(loop(x))
    float(loop1(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        t1 = time.perf_counter()
        float(loop1(x))
        t2 = time.perf_counter()
        dt = ((t1 - t0) - (t2 - t1)) / (n_inner - 1)
        best = min(best, dt)
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    results = {}
    for dtype, label in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        nbytes = np.dtype(np.float32).itemsize if label == "f32" else 2
        # 512 MB buffer, minor dim 512 (no tile padding)
        n_rows = (512 << 20) // nbytes // 512
        x = jnp.ones((n_rows, 512), dtype)

        dt = timed(lambda v: v + dtype(1.0), x)
        gbps = 2 * x.nbytes / dt / 1e9
        results[f"copy/{label}"] = gbps
        print(f"stream add  {label}: {dt*1e3:7.2f} ms  {gbps:6.1f} GB/s")

        dt = timed(lambda v: v * dtype(0.999) + v[:1], x)
        gbps = 2 * x.nbytes / dt / 1e9
        results[f"axpy/{label}"] = gbps
        print(f"axpy        {label}: {dt*1e3:7.2f} ms  {gbps:6.1f} GB/s")

        # read-only reduce: keep output shape == input shape for fori carry
        dt = timed(lambda v: v.at[0, 0].set(jnp.sum(v, dtype=jnp.float32)
                                            .astype(dtype)), x)
        gbps = x.nbytes / dt / 1e9
        results[f"reduce/{label}"] = gbps
        print(f"reduce      {label}: {dt*1e3:7.2f} ms  {gbps:6.1f} GB/s")

    peak = max(results.values())
    print(f"\npractical HBM peak: {peak:.1f} GB/s "
          f"({100*peak/819:.0f}% of 819 GB/s spec)")


if __name__ == "__main__":
    main()
