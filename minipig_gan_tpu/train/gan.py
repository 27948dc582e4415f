"""The GAN training program: models + optimizers + the single-jit train step.

Reference semantics being reproduced (/root/reference/code/GAN/GAN_final.py:
212-317 and test_runs/GAN.py:236-464):

  * Lightning runs `training_step` once per optimizer per batch: first the
    generator update (optimizer_idx 0), then the discriminator update
    (optimizer_idx 1) — the D step re-runs the generator forward with the
    ALREADY-UPDATED G params and `.detach()`es it (GAN_final.py:289-291).
    Both G forwards run in train mode, so G's BatchNorm running stats update
    twice per batch; D's BN stats update on every D forward (fake-batch during
    the G step, then real and fake batches during the D step) — all reproduced
    here through explicit `batch_stats` threading in that exact order.
  * Two independent Adam(b1=0.5, b2=0.999) optimizers (GAN_final.py:298-308).
  * Losses: BCE adversarial (targets 1 for G; 0.9/0 one-sided for D) + L1
    reconstruction (+ per-tap perceptual in patch mode) — see losses.py.
  * Patch mode samples 128 random 16^3 ROIs per volume INSIDE the step
    (test_runs/GAN.py:263-272,311-337), re-sampled independently for the G
    and D sub-steps exactly as Lightning's two training_step calls would.

TPU-native design: the whole alternating update is ONE jit-compiled function
`(state, batch) -> (state, metrics)` with donated state — no host round trips,
no per-optimizer dispatch, no recompilation between sub-steps. Data
parallelism comes from jit + NamedSharding on the batch (parallel/mesh.py);
XLA inserts the gradient all-reduces over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models import (
    CasNetGenerator,
    GlobalDiscriminator,
    MonaiDiscriminator,
    PatchPerceptualDiscriminator,
)
from ..ops.patches import random_patch_pairs
from . import losses as L


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    rng: jax.Array
    g_params: Any
    g_stats: Any
    g_opt_state: Any
    d_params: Optional[Any] = None
    d_stats: Optional[Any] = None
    d_opt_state: Optional[Any] = None


def build_models(cfg: Config, bn_axis_name: Optional[str] = None):
    """Construct generator + discriminator modules from config."""
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    gen = CasNetGenerator(
        n_unet_blocks=cfg.generator.n_unet_blocks,
        channels=cfg.generator.channels,
        strides=cfg.generator.strides,
        num_res_units=cfg.generator.num_res_units,
        use_scan=cfg.generator.use_scan,
        remat=cfg.generator.remat,
        bn_axis_name=bn_axis_name,
        dtype=dtype,
    )
    kind = cfg.discriminator.kind
    if cfg.train.mode == "patch":
        kind = "patch"
    if cfg.train.mode == "generator_only":
        disc = None
    elif kind == "global":
        disc = GlobalDiscriminator(
            features=cfg.discriminator.features,
            remat=cfg.discriminator.remat,
            bn_axis_name=bn_axis_name, dtype=dtype,
        )
    elif kind == "patch":
        disc = PatchPerceptualDiscriminator(
            features=cfg.discriminator.patch_features,
            hidden=cfg.discriminator.patch_hidden,
            capture_activations=cfg.discriminator.use_perceptual,
            bn_axis_name=bn_axis_name,
            dtype=dtype,
        )
    elif kind == "monai":
        disc = MonaiDiscriminator(dropout=cfg.discriminator.monai_dropout,
                                  bn_axis_name=bn_axis_name, dtype=dtype)
    else:
        raise ValueError(f"unknown discriminator kind {kind!r}")
    return gen, disc


def build_optimizers(cfg: Config):
    def lr(base: float):
        # train.lr_decay_steps > 0: cosine-decay the base LR to
        # lr_decay_alpha*base over that many optimizer updates. The
        # reference trains at a fixed Adam LR (GAN_final.py:214-231), so
        # the default (0 = constant) is reference-parity; the schedule is
        # the standard tool for squeezing the last of the L1 floor out of
        # a bouncing fixed-LR run (used by the committed quality suite).
        if cfg.train.lr_decay_steps > 0:
            return optax.cosine_decay_schedule(
                base, cfg.train.lr_decay_steps, alpha=cfg.train.lr_decay_alpha)
        return base

    g_tx = optax.adam(lr(cfg.train.g_lr), b1=cfg.train.b1, b2=cfg.train.b2,
                      eps=1e-8)
    d_tx = optax.adam(lr(cfg.train.d_lr), b1=cfg.train.b1, b2=cfg.train.b2,
                      eps=1e-8)
    return g_tx, d_tx


class GANTrainer:
    """Owns static model/optimizer definitions; provides pure init/step fns.

    `train_step` is a pure function of (state, batch) suitable for
    jax.jit(donate_argnums=0) — the trainer object itself is static.
    """

    def __init__(self, cfg: Config, bn_axis_name: Optional[str] = None):
        self.cfg = cfg
        from ..ops import fastconv

        fastconv.set_grad_barrier(cfg.train.conv_grad_barrier)
        self.generator, self.discriminator = build_models(cfg, bn_axis_name)
        self.g_tx, self.d_tx = build_optimizers(cfg)
        self.mode = cfg.train.mode
        # only the MONAI-topology discriminator carries train-mode dropout
        # (MONAI 0.4.0 Discriminator default dropout=0.25); its applies
        # need a "dropout" rng stream
        self._d_needs_dropout_rng = (
            isinstance(self.discriminator, MonaiDiscriminator)
            and self.discriminator.dropout > 0)

    # -- init ---------------------------------------------------------------

    def init_jit(self, rng: jax.Array, sample_batch: Dict[str, jax.Array]) -> GANTrainState:
        """jit-compiled init — ONE device program instead of hundreds of tiny
        eager ops (each eager op costs a full RPC on remote-compile backends;
        measured 40s+ eager vs <5s jitted for the canonical models)."""
        return jax.jit(self.init)(rng, sample_batch)

    def init(self, rng: jax.Array, sample_batch: Dict[str, jax.Array]) -> GANTrainState:
        t1 = sample_batch["t1w"]
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        g_vars = self.generator.init(g_rng, t1, train=True)
        g_params, g_stats = g_vars["params"], g_vars.get("batch_stats", {})
        g_opt_state = self.g_tx.init(g_params)
        d_params = d_stats = d_opt_state = None
        if self.discriminator is not None:
            d_in = t1
            if self.mode == "patch":
                roi = self.cfg.patch.roi_size
                d_in = jnp.zeros((1, *roi, t1.shape[-1]), t1.dtype)
            d_init_rngs = {"params": d_rng}
            if self._d_needs_dropout_rng:
                d_init_rngs["dropout"] = jax.random.fold_in(d_rng, 0xD)
            d_vars = self.discriminator.init(d_init_rngs, d_in, train=True)
            d_params, d_stats = d_vars["params"], d_vars.get("batch_stats", {})
            d_opt_state = self.d_tx.init(d_params)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            rng=s_rng,
            g_params=g_params,
            g_stats=g_stats,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_stats=d_stats,
            d_opt_state=d_opt_state,
        )

    # -- forward helpers ----------------------------------------------------

    def _g_apply(self, params, stats, x):
        return self.generator.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )

    def _d_apply(self, params, stats, x, rng=None):
        extra = {}
        if rng is not None and self._d_needs_dropout_rng:
            extra["rngs"] = {"dropout": rng}
        out, upd = self.discriminator.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"], **extra,
        )
        if isinstance(out, tuple):
            logits, acts = out
        else:
            logits, acts = out, []
        return logits, acts, upd["batch_stats"]

    def generate(self, state: GANTrainState, t1: jax.Array) -> jax.Array:
        """Eval-mode generator forward (running BN stats), for inference."""
        return self.generator.apply(
            {"params": state.g_params, "batch_stats": state.g_stats}, t1, train=False
        )

    def recalibrate_bn_stats(self, state: GANTrainState,
                             t1_batches) -> GANTrainState:
        """Refresh the generator's BatchNorm RUNNING stats by replaying
        train-mode forwards over `t1_batches` (an iterable of (B, D, H, W, 1)
        arrays — use TRAIN-split inputs at the training batch size).

        Serving-time recalibration: the stats the eval forward uses are an
        EMA frozen wherever training stopped; on short runs / small volumes
        they can sit 20-30% away from the population statistics (the
        round-3 cpu16 scale-floor diagnosis, results/README.md). Each replay
        EMAs toward the observed batch stats with the module's own momentum
        m (torch parity 0.9), so K batches leave a m^K residual of the stale
        value — K≈25 cuts it to 7%, K≈50 to 0.5%. Reference-plus option
        (the reference evaluates with whatever stats the checkpoint holds);
        parameters and optimizer state are untouched.
        """
        replay = jax.jit(lambda stats, x: self._g_apply(
            state.g_params, stats, x)[1]["batch_stats"])
        stats = state.g_stats
        for t1 in t1_batches:
            stats = replay(stats, jnp.asarray(t1))
        return state.replace(g_stats=stats)

    def make_fast_generator(self, state: GANTrainState):
        """Jitted eval forward with BatchNorm folded into the conv weights
        (models/fold.py) — removes one full-resolution elementwise pass per
        conv, which profiling shows dominates the eval forward on TPU.
        Numerically equal to generate() up to fold rounding."""
        from ..models.fold import folded_generator

        twin, fparams = folded_generator(
            self.generator, state.g_params, state.g_stats)
        return jax.jit(lambda t1: twin.apply({"params": fparams}, t1,
                                             train=False))

    # -- the train step -----------------------------------------------------

    def train_step(
        self, state: GANTrainState, batch: Dict[str, jax.Array]
    ) -> Tuple[GANTrainState, Dict[str, jax.Array]]:
        t1, t2 = batch["t1w"], batch["t2w"]
        rng, g_rng, d_rng = jax.random.split(state.rng, 3)
        metrics: Dict[str, jax.Array] = {}

        if self.mode == "generator_only":
            # Config-1 slice (BASELINE.json): pure L1 regression. Uses the
            # same microbatch-accumulation scan as the GAN modes so
            # activation memory scales with batch/accum_steps here too.
            accum = max(1, self.cfg.train.accum_steps)
            b = t1.shape[0]
            if b % accum != 0:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {accum}")
            mb = b // accum
            t1_m = t1.reshape(accum, mb, *t1.shape[1:])
            t2_m = t2.reshape(accum, mb, *t2.shape[1:])
            zero_grads = jax.tree.map(jnp.zeros_like, state.g_params)

            def micro(carry, xs):
                g_stats, grad_acc = carry
                t1_mb, t2_mb = xs

                def loss_fn(g_params):
                    gen, g_upd = self._g_apply(g_params, g_stats, t1_mb)
                    return L.l1_loss(gen, t2_mb), g_upd["batch_stats"]

                (loss, g_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.g_params)
                return (g_stats, jax.tree.map(jnp.add, grad_acc, grads)), loss

            if self.cfg.train.unroll_accum:
                carry = (state.g_stats, zero_grads)
                losses_list = []
                for i in range(accum):
                    xs_i = (t1_m[i], t2_m[i])
                    if i:
                        carry, xs_i = jax.lax.optimization_barrier(
                            (carry, xs_i))
                    carry, loss_i = micro(carry, xs_i)
                    losses_list.append(loss_i)
                g_stats, grads = carry
                losses = jnp.stack(losses_list)
            else:
                (g_stats, grads), losses = jax.lax.scan(
                    micro, (state.g_stats, zero_grads), (t1_m, t2_m))
            grads = jax.tree.map(lambda g: g / accum, grads)
            updates, g_opt_state = self.g_tx.update(
                grads, state.g_opt_state, state.g_params
            )
            g_params = optax.apply_updates(state.g_params, updates)
            loss = jnp.mean(losses)
            metrics = {"g_recon_loss": loss, "g_loss": loss}
            new_state = state.replace(
                step=state.step + 1, rng=rng, g_params=g_params,
                g_stats=g_stats, g_opt_state=g_opt_state,
            )
            return new_state, metrics

        use_patches = self.mode == "patch"
        use_perceptual = use_patches and self.cfg.discriminator.use_perceptual
        gdl_weight = self.cfg.train.gdl_weight
        roi = self.cfg.patch.roi_size
        n_samples = self.cfg.patch.num_samples
        pallas_patches = self.cfg.patch.use_pallas

        # Gradient accumulation: the batch is split into `accum_steps`
        # microbatches processed sequentially under lax.scan, so activation
        # memory scales with the MICRObatch while the optimizer still sees the
        # full-batch gradient — how whole-volume 128^3 GAN training fits one
        # chip's HBM at reference batch sizes. BN batch statistics are
        # per-microbatch, which mirrors the reference's per-GPU `dp` stats
        # (GAN_final.py:485).
        accum = max(1, self.cfg.train.accum_steps)
        b = t1.shape[0]
        if b % accum != 0:
            raise ValueError(f"batch {b} not divisible by accum_steps {accum}")
        mb = b // accum
        t1_m = t1.reshape(accum, mb, *t1.shape[1:])
        t2_m = t2.reshape(accum, mb, *t2.shape[1:])
        g_rngs = jax.random.split(g_rng, accum)
        d_rngs = jax.random.split(d_rng, accum)
        zero_g_grads = jax.tree.map(jnp.zeros_like, state.g_params)
        zero_d_grads = jax.tree.map(jnp.zeros_like, state.d_params)

        reuse_g = self.cfg.train.reuse_g_forward

        fused = self.cfg.train.fused_step and reuse_g
        if fused:
            return self._fused_train_step(
                state, rng, t1_m, t2_m, g_rngs, d_rngs, accum,
                zero_g_grads, zero_d_grads, metrics)

        # ---- generator sub-step (optimizer_idx == 0) ----
        def g_micro(carry, xs):
            g_stats, d_stats, grad_acc = carry
            t1_mb, t2_mb, rng_mb = xs

            def g_loss_fn(g_params):
                gen, g_upd = self._g_apply(g_params, g_stats, t1_mb)
                if use_patches:
                    gen_d, real_d = random_patch_pairs(
                        rng_mb, gen, t2_mb, roi, n_samples,
                        use_pallas=pallas_patches)
                else:
                    gen_d, real_d = gen, t2_mb
                fake_logits, acts_fake, d_stats1 = self._d_apply(
                    state.d_params, d_stats, gen_d,
                    rng=jax.random.fold_in(rng_mb, 1))
                acts_real = []
                d_stats2 = d_stats1
                if use_perceptual:
                    _, acts_real, d_stats2 = self._d_apply(
                        state.d_params, d_stats1, real_d,
                        rng=jax.random.fold_in(rng_mb, 2))
                ls = L.generator_loss(
                    fake_logits, gen_d, real_d, acts_fake, acts_real,
                    use_perceptual, gdl_weight=gdl_weight)
                return ls["g_loss"], (ls, g_upd["batch_stats"], d_stats2, gen)

            (_, (ls, g_stats, d_stats, gen)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            gen_out = (jax.lax.stop_gradient(gen) if reuse_g
                       else jnp.zeros((), gen.dtype))
            return (g_stats, d_stats, grad_acc), (ls, gen_out)

        # `unroll_accum` drives the same micro body with a python loop —
        # identical math/order, but the generated volumes flow to the D
        # sub-step as live values instead of a scanned stack, and the grad
        # accumulators update in place instead of via dynamic-update-slice.
        unroll = self.cfg.train.unroll_accum
        if unroll:
            carry = (state.g_stats, state.d_stats, zero_g_grads)
            g_ls_list, gen_list = [], []
            for i in range(accum):
                xs_i = (t1_m[i], t2_m[i], g_rngs[i])
                if i:
                    # Serialize microbatches like the scan would: without
                    # this, XLA overlaps both iterations' backward
                    # temporaries and the canonical config OOMs (measured
                    # 31.8G vs 15.75G HBM).
                    carry, xs_i = jax.lax.optimization_barrier((carry, xs_i))
                carry, (ls_i, gen_i) = g_micro(carry, xs_i)
                g_ls_list.append(ls_i)
                gen_list.append(gen_i)
            g_stats, d_stats, g_grads = carry
            g_ls = jax.tree.map(lambda *xs: jnp.stack(xs), *g_ls_list)
        else:
            (g_stats, d_stats, g_grads), (g_ls, gen_stack) = jax.lax.scan(
                g_micro, (state.g_stats, state.d_stats, zero_g_grads),
                (t1_m, t2_m, g_rngs))
        g_grads = jax.tree.map(lambda g: g / accum, g_grads)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics.update(jax.tree.map(lambda x: jnp.mean(x), g_ls))

        # ---- discriminator sub-step (optimizer_idx == 1) ----
        # Fresh G forward with the UPDATED generator, detached
        # (GAN_final.py:289-291); G BN stats update a second time. With
        # train.reuse_g_forward the G-step's (pre-update) volumes are reused
        # instead — one generator forward saved per step.
        def d_micro(carry, xs):
            g_stats, d_stats, grad_acc = carry
            t1_mb, t2_mb, rng_mb, gen_prev = xs
            if reuse_g:
                gen2 = gen_prev
            else:
                gen2, g_upd2 = self._g_apply(g_params, g_stats, t1_mb)
                gen2 = jax.lax.stop_gradient(gen2)
                g_stats = g_upd2["batch_stats"]
            if use_patches:
                gen_d2, real_d2 = random_patch_pairs(
                    rng_mb, gen2, t2_mb, roi, n_samples,
                    use_pallas=pallas_patches)
            else:
                gen_d2, real_d2 = gen2, t2_mb

            def d_loss_fn(d_params):
                real_logits, _, d_s1 = self._d_apply(
                    d_params, d_stats, real_d2,
                    rng=jax.random.fold_in(rng_mb, 3))
                fake_logits, _, d_s2 = self._d_apply(
                    d_params, d_s1, gen_d2,
                    rng=jax.random.fold_in(rng_mb, 4))
                ls = L.discriminator_loss(
                    real_logits, fake_logits,
                    self.cfg.train.one_sided_label_value)
                return ls["d_loss"], (ls, d_s2)

            (_, (ls, d_stats)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            return (g_stats, d_stats, grad_acc), ls

        if unroll:
            carry = (g_stats, d_stats, zero_d_grads)
            d_ls_list = []
            for i in range(accum):
                xs_i = (t1_m[i], t2_m[i], d_rngs[i], gen_list[i])
                if i:
                    carry, xs_i = jax.lax.optimization_barrier((carry, xs_i))
                carry, ls_i = d_micro(carry, xs_i)
                d_ls_list.append(ls_i)
            g_stats, d_stats, d_grads = carry
            d_ls = jax.tree.map(lambda *xs: jnp.stack(xs), *d_ls_list)
        else:
            (g_stats, d_stats, d_grads), d_ls = jax.lax.scan(
                d_micro, (g_stats, d_stats, zero_d_grads),
                (t1_m, t2_m, d_rngs, gen_stack))
        d_grads = jax.tree.map(lambda g: g / accum, d_grads)
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)
        metrics.update(jax.tree.map(lambda x: jnp.mean(x), d_ls))

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            g_params=g_params,
            g_stats=g_stats,
            g_opt_state=g_opt_state,
            d_params=d_params,
            d_stats=d_stats,
            d_opt_state=d_opt_state,
        )
        return new_state, metrics

    # -- fused fast path (train.fused_step; reuse_g, global-D mode) ----------

    def _fused_train_step(self, state, rng, t1_m, t2_m, g_rngs, d_rngs,
                          accum, zero_g_grads, zero_d_grads, metrics):
        """One joint loss per microbatch: grad wrt theta_g flows only through
        the G terms (the D is frozen there via stop_gradient on its params),
        grad wrt theta_d only through the D terms (the generated volume is
        detached). In 'gan' mode the two fake-pass forwards are identical
        HLO (train-mode BN output does not depend on the threaded running
        stats), so XLA CSE executes ONE — the reuse_g data flow without a
        second scan or a stacked generated-volume buffer. In 'patch' mode
        the G and D terms draw independent patch sets (as the reference's
        two training_step calls do), so no forward is shared — the win is
        the single scan. Same for a dropout-carrying discriminator
        (kind='monai'): the G and D fake passes draw different dropout rngs
        (fold_in g_rng_mb vs d_rng_mb — fresh masks per apply, torch
        semantics), so the forwards are not identical HLO and CSE cannot
        merge them; fused stays correct but only the scan merge applies.
        Update math identical to the unfused reuse_g step; BN EMA order
        interleaves per microbatch."""
        one_sided = self.cfg.train.one_sided_label_value
        use_patches = self.mode == "patch"
        use_perceptual = use_patches and self.cfg.discriminator.use_perceptual
        gdl_weight = self.cfg.train.gdl_weight
        roi = self.cfg.patch.roi_size
        n_samples = self.cfg.patch.num_samples
        pallas_patches = self.cfg.patch.use_pallas

        def gd_micro(carry, xs):
            g_stats, d_stats, g_acc, d_acc = carry
            t1_mb, t2_mb, g_rng_mb, d_rng_mb = xs

            def joint_loss(thetas):
                g_params, d_params = thetas
                d_frozen = jax.lax.stop_gradient(d_params)
                gen, g_upd = self._g_apply(g_params, g_stats, t1_mb)
                if use_patches:
                    gen_d, real_d = random_patch_pairs(
                        g_rng_mb, gen, t2_mb, roi, n_samples,
                        use_pallas=pallas_patches)
                else:
                    gen_d, real_d = gen, t2_mb
                fake_logits_g, acts_fake, d_stats1 = self._d_apply(
                    d_frozen, d_stats, gen_d,
                    rng=jax.random.fold_in(g_rng_mb, 1))
                acts_real = []
                if use_perceptual:
                    _, acts_real, d_stats1 = self._d_apply(
                        d_frozen, d_stats1, real_d,
                        rng=jax.random.fold_in(g_rng_mb, 2))
                ls_g = L.generator_loss(
                    fake_logits_g, gen_d, real_d, acts_fake, acts_real,
                    use_perceptual, gdl_weight=gdl_weight)
                gen_sg = jax.lax.stop_gradient(gen)
                if use_patches:
                    gen_d2, real_d2 = random_patch_pairs(
                        d_rng_mb, gen_sg, t2_mb, roi, n_samples,
                        use_pallas=pallas_patches)
                else:
                    gen_d2, real_d2 = gen_sg, t2_mb
                real_logits, _, d_stats2 = self._d_apply(
                    d_params, d_stats1, real_d2,
                    rng=jax.random.fold_in(d_rng_mb, 3))
                fake_logits_d, _, d_stats3 = self._d_apply(
                    d_params, d_stats2, gen_d2,
                    rng=jax.random.fold_in(d_rng_mb, 4))
                ls_d = L.discriminator_loss(
                    real_logits, fake_logits_d, one_sided)
                total = ls_g["g_loss"] + ls_d["d_loss"]
                return total, (ls_g, ls_d, g_upd["batch_stats"], d_stats3)

            (_, (ls_g, ls_d, g_stats, d_stats)), (g_gr, d_gr) = (
                jax.value_and_grad(joint_loss, has_aux=True)(
                    (state.g_params, state.d_params)))
            g_acc = jax.tree.map(jnp.add, g_acc, g_gr)
            d_acc = jax.tree.map(jnp.add, d_acc, d_gr)
            return (g_stats, d_stats, g_acc, d_acc), {**ls_g, **ls_d}

        (g_stats, d_stats, g_grads, d_grads), ls = jax.lax.scan(
            gd_micro,
            (state.g_stats, state.d_stats, zero_g_grads, zero_d_grads),
            (t1_m, t2_m, g_rngs, d_rngs))
        g_grads = jax.tree.map(lambda g: g / accum, g_grads)
        d_grads = jax.tree.map(lambda g: g / accum, d_grads)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        d_updates, d_opt_state = self.d_tx.update(
            d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        metrics.update(jax.tree.map(lambda x: jnp.mean(x), ls))
        new_state = state.replace(
            step=state.step + 1, rng=rng,
            g_params=g_params, g_stats=g_stats, g_opt_state=g_opt_state,
            d_params=d_params, d_stats=d_stats, d_opt_state=d_opt_state,
        )
        return new_state, metrics
