"""Data-parallel train step over the virtual 8-device CPU mesh: params
replicated, batch sharded over `data`, XLA inserts the grad all-reduce.
(The TPU-native replacement for Lightning `accelerator='dp'`,
GAN_final.py:485.)"""

import numpy as np

import jax
import jax.numpy as jnp

from minipig_gan_tpu.config import (
    Config, DiscriminatorConfig, GeneratorConfig, PatchConfig, TrainConfig,
)
from minipig_gan_tpu.parallel import make_mesh, replicate, shard_batch
from minipig_gan_tpu.train import GANTrainer

import pytest

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)


def tiny_cfg():
    return Config(
        generator=GeneratorConfig(n_unet_blocks=2, channels=(4, 8), strides=(2,)),
        discriminator=DiscriminatorConfig(features=(4, 4, 4, 4)),
        train=TrainConfig(compute_dtype="float32"),
    )


def make_batch(b=8, spatial=16, seed=0):
    rs = np.random.RandomState(seed)
    t1 = np.tanh(rs.randn(b, spatial, spatial, spatial, 1)).astype(np.float32)
    t2 = np.clip(0.8 * t1 + 0.1, -1, 1).astype(np.float32)
    return {"t1w": t1, "t2w": t2}


def test_dp_train_step_8_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    tr = GANTrainer(tiny_cfg())
    host_batch = make_batch()
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in host_batch.items()})
    state = tr.init(jax.random.PRNGKey(0), batch)
    state = replicate(mesh, state)

    step = jax.jit(tr.train_step, donate_argnums=0)
    new_state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params stay replicated (no unintended sharding introduced)
    for leaf in jax.tree.leaves(new_state.g_params):
        assert leaf.sharding.is_fully_replicated, leaf.sharding


def test_dp_matches_single_device_global_batch():
    """Same global batch, same init -> DP-sharded step must equal the
    unsharded step (sync-BN over global batch in both cases)."""
    mesh = make_mesh()
    tr = GANTrainer(tiny_cfg())
    host_batch = make_batch(b=8)
    jb = {k: jnp.asarray(v) for k, v in host_batch.items()}

    state0 = tr.init(jax.random.PRNGKey(1), jb)
    # single-device reference
    s1, m1 = jax.jit(tr.train_step)(state0, jb)
    # sharded
    sharded_state = replicate(mesh, tr.init(jax.random.PRNGKey(1), jb))
    sb = shard_batch(mesh, jb)
    s2, m2 = jax.jit(tr.train_step)(sharded_state, sb)

    assert abs(float(m1["g_loss"]) - float(m2["g_loss"])) < 1e-4
    assert abs(float(m1["d_loss"]) - float(m2["d_loss"])) < 1e-4
    # Adam updates have magnitude ~lr regardless of grad size, so an fp-noise
    # SIGN flip on a near-zero gradient produces a 2*lr param diff between
    # bitwise-different-but-equivalent reduction orders. Allow that; anything
    # larger would indicate a real semantic divergence.
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1.g_params, s2.g_params)
    lr = tiny_cfg().train.g_lr
    assert max(jax.tree.leaves(diffs)) <= 2.1 * lr
    # the bulk of params must agree tightly
    leaves = sorted(jax.tree.leaves(diffs))
    assert leaves[len(leaves) // 2] < 1e-6  # median


def test_spatial_sharding_generator_only():
    """Volumes sharded over the `spatial` mesh axis (depth dim): XLA SPMD
    inserts the conv halo exchanges; result matches the unsharded step."""
    from minipig_gan_tpu.config import MeshConfig
    from minipig_gan_tpu.parallel import batch_sharding
    import jax.numpy as jnp

    cfg = Config(
        generator=GeneratorConfig(n_unet_blocks=2, channels=(4, 8), strides=(2,)),
        train=TrainConfig(compute_dtype="float32", mode="generator_only"),
    )
    mesh = make_mesh(MeshConfig(data=2, spatial=4))
    tr = GANTrainer(cfg)
    host = make_batch(b=2, spatial=16)
    jb = {k: jnp.asarray(v) for k, v in host.items()}

    state0 = tr.init(jax.random.PRNGKey(0), jb)
    s_ref, m_ref = jax.jit(tr.train_step)(state0, jb)

    sh = batch_sharding(mesh, shard_spatial=True)
    sb = {k: jax.device_put(v, sh) for k, v in jb.items()}
    state = replicate(mesh, tr.init(jax.random.PRNGKey(0), jb))
    s2, m2 = jax.jit(tr.train_step)(state, sb)
    assert abs(float(m_ref["g_loss"]) - float(m2["g_loss"])) < 1e-4


class TestDistributedBringup:
    """maybe_initialize_distributed: env gating + argument plumbing.

    True multi-host runs need multiple controllers; here we verify the
    single-process contract (no-op without the env, correct
    jax.distributed.initialize arguments with it) — the SPMD compute path
    itself is identical to the single-controller programs the rest of
    this suite validates on the 8-device mesh."""

    def test_noop_without_env(self, monkeypatch):
        from minipig_gan_tpu.parallel import maybe_initialize_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("MINIPIG_DISTRIBUTED", raising=False)
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        assert maybe_initialize_distributed() is False
        assert calls == []

    def test_explicit_coordinator_env(self, monkeypatch):
        from minipig_gan_tpu.parallel import maybe_initialize_distributed

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        assert maybe_initialize_distributed() is True
        assert calls == [{"coordinator_address": "10.0.0.1:1234",
                          "num_processes": 4, "process_id": 2}]

    def test_pod_autodetect_env(self, monkeypatch):
        from minipig_gan_tpu.parallel import maybe_initialize_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("MINIPIG_DISTRIBUTED", "1")
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        assert maybe_initialize_distributed() is True
        assert calls == [{}]  # TPU-pod topology auto-detection
