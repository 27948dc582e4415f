"""Training loop: data -> mesh -> jit step -> logging/checkpoints.

The orchestration layer replacing the reference's `pl.Trainer(...).fit(model,
data)` (/root/reference/code/GAN/GAN_final.py:474-492): epoch loop over the
cached dataset with shuffling, the single-jit alternating GAN step per batch,
per-step metric logging (g_adv/g_recon/g_loss/d_loss, GAN_final.py:266-295),
three loss-monitored top-k checkpoints (:448-472), per-epoch generated-volume
snapshots to TensorBoard (:310-317), and resume-from-last.

TPU specifics: train batches are padded/dropped to a single static shape (one
compiled program for the whole run), device transfer overlaps compute through
the double-buffered prefetcher, and the step function is jit-donated so the
train state never doubles in HBM.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.pipeline import (
    BatchLoader,
    CachedDataset,
    DevicePrefetcher,
    PairPreprocessor,
    WrapAroundLoader,
)
from ..data.structure import load_structure, split_pairs
from ..data.synthetic import make_bids_dataset
from ..parallel import make_mesh, replicate, shard_batch
from ..utils.logging_util import MetricLogger
from ..utils.profiling import StepTimer
from .checkpoints import TopKCheckpointManager
from .gan import GANTrainer, GANTrainState


def build_datasets(cfg: Config, log_dir: Path, lazy_train: bool = False):
    """structure.json -> cached train/val/test datasets + the RESOLVED
    structure.json path. With no structure_json configured, generates a
    synthetic BIDS fixture (data/synthetic.py) so the end-to-end loop runs
    anywhere; the caller persists the resolved path into the checkpoint
    config so `cli.infer --ckpt` works on synthetic runs without --data.

    `lazy_train=True` (multi-host): skip the eager train-cache build and
    memoize on access, so each process only ever preprocesses the items its
    local batch slice reads (see CachedDataset.lazy)."""
    structure_json = cfg.data.structure_json
    if not structure_json:
        n = cfg.data.synthetic_num_pairs or 8
        structure_json = make_bids_dataset(
            log_dir / "synthetic_data", n_subjects=n,
            shape_zyx=(
                max(16, cfg.data.spatial_size[0] // 2),
                max(16, cfg.data.spatial_size[1] // 2),
                max(16, cfg.data.spatial_size[2] // 2),
            ),
            seed=cfg.train.seed,
            n_blobs=cfg.data.synthetic_blobs,
            t1_bias=cfg.data.synthetic_t1_bias,
        )
    structure = load_structure(structure_json)
    pairs = split_pairs(structure)
    pre = PairPreprocessor(cfg.data)
    train_ds = CachedDataset(pairs["train"], pre, cfg.data.cache_num,
                             cfg.data.num_workers, lazy=lazy_train)
    val_ds = CachedDataset(pairs["validation"], pre, min(10, cfg.data.cache_num),
                           max(2, cfg.data.num_workers // 4))
    test_ds = CachedDataset(pairs["test"], pre, min(10, cfg.data.cache_num),
                            max(2, cfg.data.num_workers // 4))
    return train_ds, val_ds, test_ds, str(structure_json)


def train(cfg: Config, resume: bool = True,
          max_steps: Optional[int] = None) -> Tuple[GANTrainState, TopKCheckpointManager]:
    log_dir = Path(cfg.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    # multi-host: every process runs the identical SPMD compute; only
    # process 0 writes metrics/TB/checkpoints (parallel/mesh.py::
    # maybe_initialize_distributed documents the bring-up)
    is_main = jax.process_index() == 0
    n_proc = jax.process_count()
    logger = MetricLogger(log_dir, echo_every=cfg.train.log_every,
                          resume=resume) \
        if is_main else None
    mesh_cfg = cfg.mesh
    if mesh_cfg.data <= 0:
        # auto mesh: the data axis must divide the batch; use the largest
        # device count that does (a 1-chip mesh on the bench/TPU box, all 8
        # on the virtual CPU mesh when the batch allows)
        import math as _math

        n_avail = len(jax.devices()) // max(1, mesh_cfg.spatial)
        data = _math.gcd(cfg.train.batch_size, n_avail) or 1
        from ..config import MeshConfig

        mesh_cfg = MeshConfig(data=data, spatial=mesh_cfg.spatial)
    mesh = make_mesh(mesh_cfg)
    trainer = GANTrainer(cfg)
    max_steps = max_steps if max_steps is not None else cfg.train.max_steps

    # multi-host: train.batch_size stays the GLOBAL batch (reference
    # semantics). Every process computes the IDENTICAL global batch order
    # (same seed -> same permutation, preserving the reference's
    # once-per-epoch sampling exactly) but via the loaders' `select` only
    # MATERIALIZES its own contiguous slice of each global batch — a true
    # partition (no sample duplicated within a batch or repeated across
    # hosts) in which each host preprocesses only ~1/n_proc of the stream
    # (lazy per-host caching; round 2 built the full cache on every host).
    local_bs = cfg.train.batch_size
    if n_proc > 1:
        if cfg.train.batch_size % n_proc:
            raise ValueError(
                f"train.batch_size={cfg.train.batch_size} must divide by "
                f"process_count={n_proc} for multi-host DP")
        local_bs = cfg.train.batch_size // n_proc
    local_sel = None
    if n_proc > 1:
        lo = jax.process_index() * local_bs
        local_sel = (lo, lo + local_bs)
    train_ds, val_ds, test_ds, resolved_structure = build_datasets(
        cfg, log_dir, lazy_train=n_proc > 1)
    if resolved_structure != cfg.data.structure_json:
        # persist the generated fixture's path into the config the
        # checkpoints carry (self-describing synthetic runs)
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, data=_dc.replace(cfg.data, structure_json=resolved_structure))
    if len(train_ds) < cfg.train.batch_size:
        raise ValueError(
            f"train split has {len(train_ds)} pairs but batch_size is "
            f"{cfg.train.batch_size} (full batches are required for the "
            f"static-shape step) — add data or lower train.batch_size."
        )
    if cfg.data.wrap_last_batch:
        # the reference's CustomDataLoader semantics (test_runs/GAN.py:204-233):
        # sequential full-size batches, wrapping to index 0 instead of
        # dropping the final partial batch
        import math as _math

        wrap = WrapAroundLoader(train_ds, cfg.train.batch_size,
                                select=local_sel)
        steps_per_epoch = _math.ceil(len(train_ds) / cfg.train.batch_size)

        class _WrapEpochs:
            def epoch(self):
                return (next(wrap) for _ in range(steps_per_epoch))

        loader = _WrapEpochs()
    else:
        loader = BatchLoader(train_ds, cfg.train.batch_size,
                             shuffle=cfg.data.shuffle,
                             seed=cfg.train.seed, drop_last=True,
                             select=local_sel)

    # example volumes for the per-epoch snapshot (reference uses first test and
    # first train batch, GAN_final.py:476-478)
    example_test = test_ds[0]["t1w"][None] if len(test_ds) else train_ds[0]["t1w"][None]
    example_train = train_ds[0]["t1w"][None]
    if n_proc > 1:
        # multi-controller SPMD: jit inputs must be global arrays, and
        # every process executes the same programs collectively
        example_test = replicate(mesh, jnp.asarray(example_test))
        example_train = replicate(mesh, jnp.asarray(example_train))

    sample = next(iter(loader.epoch()))
    state = trainer.init_jit(jax.random.PRNGKey(cfg.train.seed),
                             {k: jnp.asarray(v) for k, v in sample.items()})
    ckpts = TopKCheckpointManager(log_dir / "checkpoints", cfg)
    if resume and ckpts.latest_for_resume():
        from .checkpoints import restore_state

        state = restore_state(ckpts.latest_for_resume(), jax.eval_shape(lambda: state))
        print(f"resumed from {ckpts.latest_for_resume()} at step {int(state.step)}")
    if n_proc > 1:
        # only process 0 writes checkpoints, so on per-host disks the other
        # processes may have found nothing (or something stale): make
        # process 0's state authoritative before declaring it replicated —
        # otherwise divergent per-host params would be stamped as one
        # "replicated" global array and the hosts' step bounds would differ
        # (a distributed hang at exit).
        from jax.experimental import multihost_utils

        state = multihost_utils.broadcast_one_to_all(state)
    state = replicate(mesh, state)

    step_fn = jax.jit(trainer.train_step, donate_argnums=0)
    timer = StepTimer()
    generate = jax.jit(trainer.generate)

    step = int(jax.device_get(state.step))
    epoch = 0
    monitor_every = max(1, cfg.train.monitor_every)
    # A per-step jax.device_get(metrics) between dispatches costs a full
    # device round-trip (~25 ms RPC on tunneled backends) and stalls the
    # dispatch pipeline. The metrics are a handful of scalars, so buffer
    # the device handles and fetch them in ONE batched transfer on
    # monitor_every boundaries: per-step metrics.jsonl logging is fully
    # preserved (each buffered step is logged at its own step index, just
    # delivered at the boundary), and the loss monitors see the per-key
    # MIN over the window — value parity with Lightning's per-step
    # ModelCheckpoint monitors (GAN_final.py:448-472).
    #
    # Which STATE those monitors save (train.monitor_exact, default on):
    # a device-side best tracker keeps, per monitored key, a copy of the
    # train state at the key's within-window argmin step — one masked
    # select per step, no host traffic — so the checkpoint holds the EXACT
    # weights that achieved the monitored value (Lightning semantics) and
    # the index records values the saved state actually achieved. With
    # monitor_exact=false the boundary state is saved instead (exact at
    # monitor_every == 1, <= monitor_every-1 steps of drift otherwise) —
    # the index then records the window-min VALUE against boundary WEIGHTS,
    # a phantom minimum that can also reject genuinely better later states.
    pending: list = []
    metrics: Dict[str, float] = {}
    # rows accumulated since the last monitor-SAVE decision: with
    # train.monitor_save_every=N the decision (and its full-state fetch on
    # improvement) runs every Nth flushed window — the device-side exact
    # tracker spans the deferred windows, so the saved weights are still
    # the span argmin (see TrainConfig.monitor_save_every).
    span_rows: list = []
    save_every = max(1, cfg.train.monitor_save_every)
    windows_flushed = 0

    monitor_keys = [m.metric for m in ckpts.monitors]
    exact = bool(cfg.train.monitor_exact) and monitor_every > 1
    best = None  # {key: (value_dev, state_dev)} — device-side, exact mode

    def _update_best(best, new_state, metrics_dev):
        out = {}
        for k, (bv, bs) in best.items():
            val = metrics_dev[k].astype(jnp.float32)
            better = val < bv
            out[k] = (
                jnp.where(better, val, bv),
                jax.tree.map(
                    lambda n, o: jnp.where(better, n, o), new_state, bs),
            )
        return out

    update_best = jax.jit(_update_best, donate_argnums=0)

    def _reset_best_vals(best):
        return {k: (jnp.full((), jnp.inf, jnp.float32), bs)
                for k, (bv, bs) in best.items()}

    reset_best_vals = jax.jit(_reset_best_vals, donate_argnums=0)

    def flush_metrics() -> bool:
        """Batched metric fetch + per-step logging; returns True if a
        window was flushed (the monitor checkpoint decision then happens
        OUTSIDE the step timer — serializing a checkpoint to disk is not
        train-step time)."""
        nonlocal pending, metrics
        if not pending:
            return False
        host = jax.device_get([m for _, m in pending])
        if logger is not None:
            for (s, _), hm in zip(pending, host):
                logger.log_metrics(hm, s)
        span_rows.extend((s, {k: float(v) for k, v in hm.items()})
                         for (s, _), hm in zip(pending, host))
        metrics = {k: min(float(hm[k]) for hm in host) for k in host[-1]}
        pending = []
        return True

    def save_monitors() -> None:
        """Monitor-checkpoint decision for the accumulated span of flushed
        windows (one window with monitor_save_every=1)."""
        nonlocal best, span_rows
        rows, span_rows = span_rows, []
        if not rows:
            return
        if not exact:
            vals = {k: min(r[1][k] for r in rows) for k in rows[-1][1]}
            ckpts.maybe_save(lambda: jax.device_get(state), vals, step)
            return
        # exact mode: per key, save that key's own argmin state; label it
        # with the argmin STEP's full metric row (a consistent snapshot of
        # the step the weights come from, not a min over mixed steps)
        for k in monitor_keys:
            if k not in rows[0][1]:
                continue
            s_k, m_k = min(rows, key=lambda r: r[1][k])
            ckpts.maybe_save(lambda: jax.device_get(best[k][1]),
                             m_k, s_k, only=[k])
        best = reset_best_vals(best)

    while step < max_steps:
        batches = DevicePrefetcher(
            loader.epoch(), lambda b: shard_batch(mesh, b), depth=cfg.data.prefetch
        )
        for batch in batches:
            flushed = False
            with timer.step():
                state, metrics_dev = step_fn(state, batch)
                step += 1
                if exact:
                    try:
                        if best is None:
                            # first step: seed every tracked key with this
                            # step's value and state (one extra state copy
                            # per monitored key lives in HBM from here on).
                            # jnp.copy throughout: the seeded buffers must
                            # be OWNED by `best` — update_best donates them,
                            # and a buffer shared with `pending` or `state`
                            # would be deleted out from under its other
                            # reader.
                            best = {
                                k: (jnp.copy(
                                        metrics_dev[k].astype(jnp.float32)),
                                    jax.tree.map(jnp.copy, state))
                                for k in monitor_keys if k in metrics_dev
                            }
                        else:
                            best = update_best(best, state, metrics_dev)
                    except Exception as e:  # noqa: BLE001 — HBM fallback
                        # the per-key state copies didn't fit next to the
                        # train step (tight-HBM configs): degrade to
                        # boundary-state monitors rather than aborting
                        msg = str(e).lower()
                        if ("resource_exhausted" not in msg
                                and "out of memory" not in msg):
                            raise
                        print("monitor_exact: per-key state copies exceed "
                              "HBM; falling back to boundary-state monitors "
                              f"({e!s:.120})")
                        exact, best = False, None
                pending.append((step, metrics_dev))
                if step % monitor_every == 0 or step >= max_steps:
                    flushed = flush_metrics()
            # checkpoint calls are COLLECTIVE under multi-controller (orbax
            # barriers internally; process 0 decides + writes, the others
            # participate) — so no is_main gate here
            if flushed:
                windows_flushed += 1
                if (windows_flushed % save_every == 0
                        or step >= max_steps):
                    save_monitors()
            if step % cfg.train.checkpoint_every == 0:
                ckpts.save_last(jax.device_get(state), step)
            if step >= max_steps:
                break
        epoch += 1
        if cfg.train.image_log_every_epochs and epoch % cfg.train.image_log_every_epochs == 0:
            gen_test = np.asarray(jax.device_get(
                generate(state, jnp.asarray(example_test))))[0]
            gen_train = np.asarray(jax.device_get(
                generate(state, jnp.asarray(example_train))))[0]
            if logger is not None:
                logger.log_volume("generated_t2w_test", gen_test, step)
                logger.log_volume("generated_t2w_train", gen_train, step)

    flush_metrics()
    host_state = jax.device_get(state)
    if metrics:
        ckpts.maybe_save(host_state,
                         {k: float(v) for k, v in metrics.items()}, step)
    ckpts.save_last(host_state, step)
    if is_main:
        report = timer.report(items_per_step=cfg.train.batch_size)
        print(f"training done at step {step}: "
              f"{report['items_per_s']:.2f} vols/s "
              f"({report['mean_s']*1e3:.0f} ms/step)")
        logger.close()
    return host_state, ckpts
