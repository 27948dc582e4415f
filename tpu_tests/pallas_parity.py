"""Real-TPU (non-interpret) parity checks for the Pallas kernels.

Run directly on a box with the TPU attached (NOT under tests/conftest.py,
which forces the CPU backend):

    PYTHONPATH=/root/repo:/root/.axon_site python tpu_tests/pallas_parity.py

tests/test_pallas_kernels.py::test_pallas_compiled_on_tpu invokes this in a
subprocess when MINIPIG_TPU_TESTS=1. Results are recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("SKIP: no TPU device available")
        return 0
    print(f"device: {dev}")

    from minipig_gan_tpu.ops.pallas.patches_kernel import extract_patches_pallas
    from minipig_gan_tpu.ops.pallas.resample_kernel import separable_resample_pallas
    from minipig_gan_tpu.ops.patches import (
        extract_patches, extract_patches_fast, sample_patch_corners,
    )
    from minipig_gan_tpu.ops.resample import _axis_weights, separable_resample

    failures = 0

    # -- patch kernel, canonical geometry (128^3 vol, 16^3 roi), f32 + bf16 --
    rs = np.random.RandomState(0)
    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 1e-2)):
        vols = jnp.asarray(rs.rand(2, 128, 128, 128, 1), dtype)
        corners = sample_patch_corners(
            jax.random.PRNGKey(1), 2, (128, 128, 128), (16, 16, 16), 32)
        got = jax.jit(
            lambda v, c: extract_patches_pallas(v, c, (16, 16, 16))
        )(vols, corners)
        want = jax.jit(
            lambda v, c: extract_patches(v, c, (16, 16, 16))
        )(vols, corners)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        ok = err <= tol
        failures += not ok
        print(f"patch kernel {jnp.dtype(dtype).name}: max|err|={err:.2e} "
              f"{'OK' if ok else 'FAIL'}")

    # -- patch kernel gradient through custom_vjp (W=128 -> kernel engaged) --
    vols = jnp.asarray(rs.rand(2, 64, 64, 128, 1), jnp.float32)
    corners = sample_patch_corners(
        jax.random.PRNGKey(2), 2, (64, 64, 128), (16, 16, 16), 16)
    g_fast = jax.jit(jax.grad(
        lambda v: jnp.sum(extract_patches_fast(v, corners, (16, 16, 16)) ** 2)
    ))(vols)
    g_xla = jax.jit(jax.grad(
        lambda v: jnp.sum(extract_patches(v, corners, (16, 16, 16)) ** 2)
    ))(vols)
    err = float(jnp.max(jnp.abs(g_fast - g_xla)))
    ok = err <= 1e-5
    failures += not ok
    print(f"patch kernel grad: max|err|={err:.2e} {'OK' if ok else 'FAIL'}")

    # -- fused resample kernel, canonical human grid shape --
    vol = rs.rand(180, 256, 256).astype(np.float32)
    wz = _axis_weights(128, 180, 180 / 128, 0.2)
    wy = _axis_weights(128, 256, 2.0, 0.0)
    wx = _axis_weights(128, 256, 2.0, 0.0)
    got = jax.device_get(separable_resample_pallas(jnp.asarray(vol), (wz, wy, wx)))
    want = jax.device_get(separable_resample(
        jnp.asarray(vol), (jnp.asarray(wz), jnp.asarray(wy), jnp.asarray(wx))))
    err = float(np.max(np.abs(got - want)))
    ok = err <= 1e-3
    failures += not ok
    print(f"resample kernel: max|err|={err:.2e} {'OK' if ok else 'FAIL'}")

    # -- patch-mode train step with cfg.patch.use_pallas=True, compiled --
    from minipig_gan_tpu.config import (
        Config, DiscriminatorConfig, GeneratorConfig, PatchConfig, TrainConfig,
    )
    from minipig_gan_tpu.train import GANTrainer

    cfg = Config(
        generator=GeneratorConfig(n_unet_blocks=2, channels=(4, 8), strides=(2,)),
        discriminator=DiscriminatorConfig(),
        patch=PatchConfig(roi_size=(16, 16, 16), num_samples=8, use_pallas=True),
        train=TrainConfig(mode="patch", batch_size=2, compute_dtype="float32",
                          accum_steps=1),
    )
    tr = GANTrainer(cfg)
    # W=128 so the Pallas crop (not the XLA fallback) is inside the jit step
    x = jnp.asarray(rs.rand(2, 32, 32, 128, 1), jnp.float32)
    batch = {"t1w": x, "t2w": 0.8 * x}
    state = tr.init_jit(jax.random.PRNGKey(0), batch)
    step = jax.jit(tr.train_step, donate_argnums=0)
    state, metrics = step(state, batch)
    g = float(metrics["g_loss"])
    ok = np.isfinite(g)
    failures += not ok
    print(f"patch-mode train step (use_pallas): g_loss={g:.4f} "
          f"{'OK' if ok else 'FAIL'}")

    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
