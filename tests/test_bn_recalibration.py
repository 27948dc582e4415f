"""Serving-time BN recalibration (GANTrainer.recalibrate_bn_stats): replaying
train-mode forwards must move the generator's running statistics to the
replayed distribution without touching parameters — the reference-plus
eval option motivated by the round-3 cpu16 scale-floor diagnosis."""

import numpy as np

import jax
import jax.numpy as jnp

from minipig_gan_tpu.config import (
    Config, DiscriminatorConfig, GeneratorConfig, TrainConfig,
)
from minipig_gan_tpu.train import GANTrainer


def _cfg():
    return Config(
        generator=GeneratorConfig(n_unet_blocks=1, channels=(2, 4),
                                  strides=(2,)),
        discriminator=DiscriminatorConfig(features=(2, 2, 2, 2)),
        train=TrainConfig(compute_dtype="float32", mode="generator_only",
                          batch_size=2),
    )


def _batch(shift=0.0, seed=0, spatial=16):
    rs = np.random.RandomState(seed)
    t1 = (rs.randn(2, spatial, spatial, spatial, 1) + shift).astype(
        np.float32)
    return {"t1w": jnp.asarray(t1), "t2w": jnp.asarray(t1)}


def test_recalibration_moves_stats_not_params():
    tr = GANTrainer(_cfg())
    state = tr.init(jax.random.PRNGKey(0), _batch())

    # replay a strongly shifted input distribution for K batches
    shifted = [_batch(shift=3.0, seed=s)["t1w"] for s in range(30)]
    new_state = tr.recalibrate_bn_stats(state, shifted)

    # params and optimizer state untouched (bit-identical)
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(new_state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # stats moved
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.g_stats, new_state.g_stats)))
    assert moved > 0.01, moved

    # the FIRST BN's running mean tracks the shifted input's first-conv
    # output statistics: replaying the same distribution twice as long
    # changes stats much less than the first pass did (converged EMA)
    more = tr.recalibrate_bn_stats(new_state, shifted + shifted)
    drift2 = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        new_state.g_stats, more.g_stats)))
    assert drift2 < moved * 0.2, (drift2, moved)

    # and the eval-mode forward actually uses the new stats
    x = _batch(shift=3.0, seed=99)["t1w"]
    y_old = tr.generate(state, x)
    y_new = tr.generate(new_state, x)
    assert float(jnp.abs(y_old - y_new).max()) > 1e-5
