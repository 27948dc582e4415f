"""Train-step semantics: alternating G/D updates, detach, BN-stat threading,
loss descent on a toy problem — reproducing the Lightning two-optimizer loop
(GAN_final.py:250-308) as one jit step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipig_gan_tpu.config import (
    Config,
    DiscriminatorConfig,
    GeneratorConfig,
    PatchConfig,
    TrainConfig,
)
from minipig_gan_tpu.train import GANTrainer

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)


def tiny_cfg(mode="gan", **train_kw):
    return Config(
        generator=GeneratorConfig(n_unet_blocks=2, channels=(4, 8), strides=(2,)),
        discriminator=DiscriminatorConfig(features=(4, 4, 4, 4),
                                          patch_features=(4, 4, 4, 4), patch_hidden=4),
        patch=PatchConfig(roi_size=(12, 12, 12), num_samples=4),
        train=TrainConfig(compute_dtype="float32", **train_kw, mode=mode),
    )


def make_batch(spatial=32, b=2, seed=0):
    rs = np.random.RandomState(seed)
    t1 = np.tanh(rs.randn(b, spatial, spatial, spatial, 1)).astype(np.float32)
    # target correlated with input (translation task is learnable)
    t2 = np.clip(0.8 * t1 + 0.1, -1, 1).astype(np.float32)
    return {"t1w": jnp.asarray(t1), "t2w": jnp.asarray(t2)}


def test_gan_step_runs_and_updates_both_networks():
    cfg = tiny_cfg("gan")
    tr = GANTrainer(cfg)
    batch = make_batch()
    state = tr.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(tr.train_step)
    new_state, metrics = step(state, batch)

    for k in ("g_adv_loss", "g_recon_loss", "g_loss", "d_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # both param trees changed
    g_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.g_params, new_state.g_params)
    d_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.d_params, new_state.d_params)
    assert max(jax.tree.leaves(g_diff)) > 0
    assert max(jax.tree.leaves(d_diff)) > 0
    # BN running stats moved for both nets
    assert max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.g_stats, new_state.g_stats))) > 0
    assert max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.d_stats, new_state.d_stats))) > 0
    assert int(new_state.step) == 1


def test_generator_only_mode_decreases_l1():
    cfg = tiny_cfg("generator_only", g_lr=1e-3)
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(1), batch)
    assert state.d_params is None
    step = jax.jit(tr.train_step)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["g_loss"])
    last = float(metrics["g_loss"])
    assert last < first * 0.7, (first, last)


def test_patch_mode_step():
    cfg = tiny_cfg("patch")
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(2), batch)
    step = jax.jit(tr.train_step)
    _, metrics = step(state, batch)
    assert "g_perceptual_loss" in metrics
    assert np.isfinite(float(metrics["g_perceptual_loss"]))


def test_patch_mode_no_perceptual_ablation():
    """GAN2.py twin: use_perceptual=False drops the loss term."""
    cfg = tiny_cfg("patch")
    cfg = Config(
        generator=cfg.generator,
        discriminator=DiscriminatorConfig(
            features=(4, 4, 4, 4), patch_features=(4, 4, 4, 4),
            patch_hidden=4, use_perceptual=False),
        patch=cfg.patch, train=cfg.train,
    )
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(3), batch)
    _, metrics = jax.jit(tr.train_step)(state, batch)
    assert "g_perceptual_loss" not in metrics


def test_d_step_does_not_backprop_into_g():
    """detach semantics (GAN_final.py:289-291): the D sub-step must not
    influence the G update. The D-step loss, viewed as a function of the
    generator params through the detached G forward, must have exactly zero
    gradient."""
    import minipig_gan_tpu.train.losses as L

    cfg = tiny_cfg("gan")
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(4), batch)

    def d_loss_wrt_g(g_params):
        gen2, _ = tr.generator.apply(
            {"params": g_params, "batch_stats": state.g_stats},
            batch["t1w"], train=True, mutable=["batch_stats"])
        gen2 = jax.lax.stop_gradient(gen2)
        fake_logits, _ = tr.discriminator.apply(
            {"params": state.d_params, "batch_stats": state.d_stats},
            gen2, train=True, mutable=["batch_stats"])
        return L.bce_with_logits(fake_logits, 0.0)

    grads = jax.grad(d_loss_wrt_g)(state.g_params)
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)) == 0.0


def test_gan_training_descends():
    """Few steps of adversarial training on the toy task: recon loss falls."""
    cfg = tiny_cfg("gan", g_lr=1e-3, d_lr=1e-4)
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(5), batch)
    step = jax.jit(tr.train_step)
    recons = []
    for _ in range(25):
        state, metrics = step(state, batch)
        recons.append(float(metrics["g_recon_loss"]))
    assert recons[-1] < recons[0], recons[:3] + recons[-3:]


def test_accum_steps_equivalent_shapes_and_finite():
    """accum_steps=2 runs and produces finite metrics; grads averaged over
    microbatches (BN per-microbatch like reference per-GPU dp stats)."""
    cfg = tiny_cfg("gan", accum_steps=2)
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16, b=4)
    state = tr.init(jax.random.PRNGKey(7), batch)
    state2, metrics = jax.jit(tr.train_step)(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.g_params, state2.g_params)
    assert max(jax.tree.leaves(d)) > 0


def test_generator_only_accum_matches_full_batch():
    """generator_only accumulation: accum_steps=2 must produce the same
    parameter update as the full-batch step up to BN-batch-stat effects —
    with BatchNorm the microbatch statistics differ, so compare on a batch
    whose halves are identical (then microbatch stats == full-batch stats
    and the grads must match to float tolerance)."""
    cfg1 = tiny_cfg("generator_only", accum_steps=1)
    cfg2 = tiny_cfg("generator_only", accum_steps=2)
    half = make_batch(spatial=16, b=2, seed=3)
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in half.items()}
    tr1, tr2 = GANTrainer(cfg1), GANTrainer(cfg2)
    state = tr1.init(jax.random.PRNGKey(9), batch)
    s1, m1 = jax.jit(tr1.train_step)(state, batch)
    s2, m2 = jax.jit(tr2.train_step)(state, batch)
    assert abs(float(m1["g_loss"]) - float(m2["g_loss"])) < 1e-5
    # Param comparison is through Adam, whose step-1 update is ~lr*sign(g):
    # floating-point noise on near-zero grads (different reduction order,
    # sum/2 vs mean-of-4) can flip signs and move a weight by O(lr)=5e-4.
    # Bound the discrepancy well under one full step yet far above what a
    # genuinely different gradient (e.g. unscaled sum) would produce.
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1.g_params, s2.g_params)
    assert max(jax.tree.leaves(diffs)) < 1e-3


def test_accum_indivisible_batch_raises():
    cfg = tiny_cfg("gan", accum_steps=3)
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16, b=4)
    state = tr.init(jax.random.PRNGKey(8), batch)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        jax.jit(tr.train_step)(state, batch)


def test_step_determinism():
    """Race/determinism check (utils/determinism.py): identical state+batch
    must produce bitwise-identical step outputs."""
    from minipig_gan_tpu.utils.determinism import check_step_determinism

    cfg = tiny_cfg("gan")
    tr = GANTrainer(cfg)
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(9), batch)
    ok, bad = check_step_determinism(jax.jit(tr.train_step), state, batch)
    assert ok, f"nondeterministic leaves: {list(bad)[:5]}"


def test_monai_discriminator_kind_step():
    """'monai' discriminator kind trains end-to-end: the jitted step must
    thread a dropout rng into every D apply (MONAI 0.4.0 Discriminator
    defaults dropout=0.25 — docs/AUDIT_MONAI_040.md §3) and the step must
    stay deterministic given the state rng."""
    cfg = Config(
        generator=GeneratorConfig(n_unet_blocks=1, channels=(4, 8), strides=(2,)),
        discriminator=DiscriminatorConfig(kind="monai"),
        train=TrainConfig(compute_dtype="float32", mode="gan", batch_size=2,
                          accum_steps=1),
    )
    tr = GANTrainer(cfg)
    assert tr._d_needs_dropout_rng
    batch = make_batch(spatial=16)
    state = tr.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(tr.train_step)
    s1, m1 = step(state, batch)
    for k in ("g_loss", "d_loss"):
        assert np.isfinite(float(m1[k])), k
    # same state rng -> bitwise-identical metrics (dropout keys derive
    # from the state rng, not host randomness)
    _, m1b = step(state, batch)
    assert float(m1b["d_loss"]) == float(m1["d_loss"])
    # second step advances the rng -> different dropout draw
    s2, m2 = step(s1, batch)
    assert float(m2["d_loss"]) != float(m1["d_loss"])


def test_lr_decay_schedule_reaches_alpha_floor():
    """train.lr_decay_steps: cosine decay to alpha*lr. With alpha=0 the LR
    hits exactly 0 after decay_steps optimizer updates, so a further step
    must leave the generator params unchanged — a sharp end-to-end check
    that the schedule is actually wired into the Adam transforms."""
    cfg = tiny_cfg("generator_only", lr_decay_steps=2, lr_decay_alpha=0.0)
    tr = GANTrainer(cfg)
    batch = make_batch()
    state = tr.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(tr.train_step)
    state, _ = step(state, batch)   # update 1 (lr > 0)
    state, _ = step(state, batch)   # update 2 (lr > 0)
    before = jax.tree.map(np.asarray, state.g_params)
    state, _ = step(state, batch)   # update 3: lr == 0
    after = jax.tree.map(np.asarray, state.g_params)
    leaves_b = jax.tree.leaves(before)
    leaves_a = jax.tree.leaves(after)
    assert all(np.array_equal(b, a) for b, a in zip(leaves_b, leaves_a))


def test_gdl_weight_wires_into_gan_and_patch_steps():
    """train.gdl_weight>0 surfaces g_gdl_loss in the step metrics (finite)
    and changes the G update vs gdl_weight=0 in both loss-scopes: full
    volumes (gan mode) and sampled patches (patch mode)."""
    for mode in ("gan", "patch"):
        batch = make_batch()
        outs = {}
        for w in (0.0, 1.0):
            cfg = tiny_cfg(mode, gdl_weight=w)
            tr = GANTrainer(cfg)
            state = tr.init(jax.random.PRNGKey(0), batch)
            new_state, metrics = jax.jit(tr.train_step)(state, batch)
            if w:
                assert "g_gdl_loss" in metrics, mode
                assert np.isfinite(float(metrics["g_gdl_loss"])), mode
            else:
                assert "g_gdl_loss" not in metrics, mode
            outs[w] = new_state.g_params
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), outs[0.0], outs[1.0])))
        assert diff > 0, f"{mode}: GDL term did not affect the G update"
