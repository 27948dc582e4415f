"""Pallas kernels vs XLA formulations: wall-clock on the real chip.

    PYTHONPATH=/root/repo:/root/.axon_site python tpu_tests/kernel_bench.py

Differential timing ((2N+fetch) - (N+fetch))/N, same method as bench.py —
plain block_until_ready is unreliable through the axon relay.
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, sync, n=20):
    fn(); sync()  # compile + warm

    def run(k):
        t0 = time.time()
        for _ in range(k):
            out = fn()
        sync(out)
        return time.time() - t0

    t1 = run(n)
    t2 = run(2 * n)
    return max((t2 - t1) / n, 1e-9)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from minipig_gan_tpu.ops.pallas.patches_kernel import extract_patches_pallas
    from minipig_gan_tpu.ops.pallas.resample_kernel import separable_resample_pallas
    from minipig_gan_tpu.ops.patches import extract_patches, sample_patch_corners
    from minipig_gan_tpu.ops.resample import _axis_weights, separable_resample

    print(f"device: {jax.devices()[0]}")
    rs = np.random.RandomState(0)

    # -- patch crop, canonical training geometry: B=4, 128^3, 128x16^3 --
    vols = jnp.asarray(rs.rand(4, 128, 128, 128, 1), jnp.bfloat16)
    corners = sample_patch_corners(
        jax.random.PRNGKey(0), 4, (128, 128, 128), (16, 16, 16), 128)
    f_xla = jax.jit(lambda: extract_patches(vols, corners, (16, 16, 16)))
    f_pl = jax.jit(lambda: extract_patches_pallas(vols, corners, (16, 16, 16)))
    sync = lambda out=None: float(jnp.sum(out[0]if out is not None else f_xla()[0]))
    t_xla = timeit(f_xla, lambda out=None: float((out if out is not None else f_xla())[0, 0, 0, 0, 0]))
    t_pl = timeit(f_pl, lambda out=None: float((out if out is not None else f_pl())[0, 0, 0, 0, 0]))
    print(f"patch crop 4x128x16^3 bf16: xla {t_xla*1e3:.2f} ms | "
          f"pallas {t_pl*1e3:.2f} ms | speedup x{t_xla/t_pl:.2f}")

    # -- resample, canonical human grid: 180x256x256 -> 128^3 f32 --
    vol = jnp.asarray(rs.rand(180, 256, 256), jnp.float32)
    wz = _axis_weights(128, 180, 180 / 128, 0.2)
    wy = _axis_weights(128, 256, 2.0, 0.0)
    wx = _axis_weights(128, 256, 2.0, 0.0)
    wj = tuple(jnp.asarray(w) for w in (wz, wy, wx))
    f_xla = jax.jit(lambda: separable_resample(vol, wj))
    f_pl = jax.jit(lambda: separable_resample_pallas(vol, (wz, wy, wx)))
    t_xla = timeit(f_xla, lambda out=None: float((out if out is not None else f_xla())[0, 0, 0]))
    t_pl = timeit(f_pl, lambda out=None: float((out if out is not None else f_pl())[0, 0, 0]))
    print(f"resample 180x256^2->128^3 f32: xla {t_xla*1e3:.2f} ms | "
          f"pallas {t_pl*1e3:.2f} ms | speedup x{t_xla/t_pl:.2f}")


if __name__ == "__main__":
    main()
