"""Checkpointing: orbax-backed state persistence + loss-monitored top-k.

Reproduces the reference's three `ModelCheckpoint` callbacks
(/root/reference/code/GAN/GAN_final.py:448-472): independent monitors on
g_loss / g_recon_loss / d_loss, mode=min, save_top_k=1, with loss-valued
checkpoint names (e.g. ``gen_recon_step=30-g_loss=100.03-g_recon_loss=0.03``),
plus hparams persistence (``save_hyperparameters`` -> config.json, the
hparams.yaml equivalent reloaded at inferrence.py:97-106). Unlike the
reference, the FULL training state is saved — G+D params, BN stats, both Adam
states, step and RNG — so training is resumable mid-run, not just usable for
inference (SURVEY.md §5 gap).
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..config import Config, to_json
from .gan import GANTrainState


def _is_main() -> bool:
    return jax.process_index() == 0


def _multiprocess() -> bool:
    return jax.process_count() > 1


def save_state(path, state: GANTrainState, cfg: Optional[Config] = None) -> None:
    """Persist a train state. Multi-controller note: orbax saves are
    COLLECTIVE — every process must call this together (orbax barriers
    internally and writes from the primary); host-side file bookkeeping
    happens on process 0 only."""
    path = Path(path).absolute()
    if _is_main() and path.exists():
        shutil.rmtree(path)
    if _multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"pre_save:{path.name}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", state)
    ckptr.wait_until_finished()
    if cfg is not None and _is_main():
        (path / "config.json").write_text(to_json(cfg))


def restore_state(path, abstract_state: GANTrainState) -> GANTrainState:
    """Restore with an abstract target (from GANTrainer.init on dummy data)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path / "state", abstract_state)


def restore_state_tolerant(path, init_state: GANTrainState,
                           verbose: bool = True) -> GANTrainState:
    """`strict=False` analogue of the reference's checkpoint loading
    (/root/reference/code/GAN/inferrence.py:105): restore whatever
    params/BN-stats leaves the checkpoint has that match the current
    architecture, keep freshly-initialized values for the rest, and report
    missing / unexpected / shape-mismatched leaves instead of failing.

    `init_state` must be a CONCRETE state from `GANTrainer.init` (its values
    seed the leaves the checkpoint can't provide). Optimizer states are kept
    from `init_state` (Lightning's strict=False also only loads module
    weights); `step` is carried over from the checkpoint when present.
    """
    path = Path(path).absolute()
    raw = ocp.StandardCheckpointer().restore(path / "state")
    missing: List[str] = []
    unexpected: List[str] = []
    mismatched: List[str] = []

    def graft(target, loaded, prefix):
        if not isinstance(target, dict):
            if loaded is None:
                missing.append(prefix.rstrip("/"))
                return target
            t_shape = tuple(getattr(target, "shape", ()))
            l_shape = tuple(getattr(loaded, "shape", ()))
            if t_shape != l_shape:
                mismatched.append(
                    f"{prefix.rstrip('/')} (ckpt {l_shape} vs model {t_shape})")
                return target
            return jax.numpy.asarray(loaded, dtype=target.dtype)
        loaded = loaded if isinstance(loaded, dict) else {}
        out = {}
        for k, tv in target.items():
            out[k] = graft(tv, loaded.get(k), f"{prefix}{k}/")
        for k in loaded:
            if k not in target:
                unexpected.append(f"{prefix}{k}")
        return out

    updates: Dict[str, Any] = {}
    for field_name in ("g_params", "g_stats", "d_params", "d_stats"):
        tv = getattr(init_state, field_name)
        if tv is None:
            continue
        updates[field_name] = graft(tv, raw.get(field_name), f"{field_name}/")
    if raw.get("step") is not None:
        updates["step"] = jax.numpy.asarray(raw["step"])
    if verbose and (missing or unexpected or mismatched):
        print(f"tolerant restore from {path}:")
        for label, names in (("missing (kept init)", missing),
                             ("unexpected (ignored)", unexpected),
                             ("shape mismatch (kept init)", mismatched)):
            for n in names:
                print(f"  {label}: {n}")
    return init_state.replace(**updates)


def load_config(path) -> Config:
    from ..config import from_json

    return from_json((Path(path) / "config.json").read_text())


@dataclass
class Monitor:
    """One monitored quantity (mode=min), like a Lightning ModelCheckpoint.
    Keeps the `top_k` best (value, path) entries, best first."""

    metric: str
    prefix: str
    top_k: int = 1
    top: List[Tuple[float, str]] = field(default_factory=list)

    def improves(self, val: float) -> bool:
        return len(self.top) < self.top_k or val < self.top[-1][0]

    def best_path(self) -> Optional[str]:
        return self.top[0][1] if self.top else None


class TopKCheckpointManager:
    """Keeps the best checkpoint(s) per monitor (ModelCheckpoint x 3,
    GAN_final.py:448-472; save_top_k = cfg.train.keep_top_k) plus a rolling
    `last` for resume. Monitors are meant to be checked on EVERY step's
    metrics (Lightning evaluates each step; saving only happens on
    improvement)."""

    def __init__(self, ckpt_dir, cfg: Optional[Config] = None,
                 monitors: Optional[List[Tuple[str, str]]] = None,
                 top_k: Optional[int] = None):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        if top_k is None:
            top_k = cfg.train.keep_top_k if cfg is not None else 1
        monitors = monitors or [
            ("g_loss", "gen"),
            ("g_recon_loss", "gen_recon"),
            ("d_loss", "dis"),
        ]
        self.monitors = [Monitor(metric=m, prefix=p, top_k=max(1, top_k))
                         for m, p in monitors]
        self._load_index()

    def _index_path(self) -> Path:
        return self.dir / "index.json"

    def _load_index(self) -> None:
        if self._index_path().exists():
            data = json.loads(self._index_path().read_text())
            for mon in self.monitors:
                if mon.metric in data:
                    entry = data[mon.metric]
                    if "top" in entry:
                        mon.top = [(float(v), p) for v, p in entry["top"]]
                    elif entry.get("path"):  # pre-top-k index format
                        mon.top = [(float(entry["best"]), entry["path"])]

    def _save_index(self) -> None:
        self._index_path().write_text(json.dumps({
            m.metric: {"top": [[v, p] for v, p in m.top]}
            for m in self.monitors
        }, indent=2))

    def _referenced(self) -> set:
        return {p for m in self.monitors for _, p in m.top}

    def maybe_save(self, state, metrics: Dict[str, float],
                   step: int, only: Optional[List[str]] = None) -> List[str]:
        """Check every monitor against this step's metrics; save under a
        loss-valued name on improvement. `state` may be the host state or a
        zero-arg callable returning it (so the device->host fetch only
        happens when some monitor actually improves). `only` restricts the
        check to the named monitors — the exact-state monitor path
        (train.monitor_exact) calls once per key with that key's own argmin
        state.

        Multi-controller: every process must call this with the same
        metrics (they are — psum'd scalars). The improvement decision is
        process 0's (its disk holds the monitor history; the flags are
        broadcast so every process joins the collective orbax save exactly
        when process 0 does), and only process 0 touches the index/files."""
        monitors = (self.monitors if only is None else
                    [m for m in self.monitors if m.metric in only])
        improved = [
            mon for mon in monitors
            if mon.metric in metrics and mon.improves(float(metrics[mon.metric]))
        ]
        if _multiprocess():
            import numpy as _np
            from jax.experimental import multihost_utils

            flags = _np.array(
                [mon.metric in metrics
                 and mon.improves(float(metrics[mon.metric]))
                 for mon in monitors], dtype=_np.int32)
            flags = _np.asarray(multihost_utils.broadcast_one_to_all(flags))
            improved = [mon for mon, f in zip(monitors, flags) if f]
        if not improved:
            return []
        if callable(state):
            state = state()
        # ONE checkpoint directory per step, shared by every monitor that
        # improved on it (the state is identical; a 3x write would only cost
        # bandwidth). The prefix records which monitors it serves.
        prefix = "+".join(mon.prefix for mon in improved)
        parts = [f"{prefix}_step={step}"]
        for k in ("g_loss", "g_recon_loss", "d_loss"):
            if k in metrics:
                parts.append(f"{k}={float(metrics[k]):.2f}")
        path = self.dir / "-".join(parts)
        save_state(path, state, self.cfg)
        if not _is_main():
            return [str(path)]
        saved = []
        for mon in improved:
            val = float(metrics[mon.metric])
            mon.top.append((val, str(path)))
            mon.top.sort(key=lambda vp: vp[0])
            dropped = [p for _, p in mon.top[mon.top_k:]]
            mon.top = mon.top[: mon.top_k]
            for p in dropped:
                if p not in self._referenced() and Path(p).exists():
                    shutil.rmtree(p, ignore_errors=True)
            saved.append(str(path))
        self._save_index()
        return saved

    def save_last(self, state: GANTrainState, step: int) -> str:
        """Crash-safe rolling resume checkpoint: write to a step-suffixed
        directory, then COMMIT by atomically replacing the last_step.json
        pointer, then GC the previous directory. A process killed mid-save
        leaves the previous committed checkpoint untouched (the round-2
        scheme rmtree'd `last` before rewriting it in place — a kill inside
        the save window lost the resume point). A `last` symlink tracks the
        committed directory for external consumers."""
        import os

        path = self.dir / f"last-{int(step)}"
        save_state(path, state, self.cfg)
        if not _is_main():
            return str(path)
        tmp = self.dir / "last_step.json.tmp"
        tmp.write_text(json.dumps({"step": int(step), "path": str(path)}))
        os.replace(tmp, self.dir / "last_step.json")  # the commit point
        link = self.dir / "last"
        if not (link.exists() and link.is_dir() and not link.is_symlink()):
            # best-effort compat symlink (skipped for legacy in-place dirs)
            tmp_link = self.dir / ".last.tmp"
            try:
                if tmp_link.is_symlink() or tmp_link.exists():
                    tmp_link.unlink()
                os.symlink(path.name, tmp_link)
                os.replace(tmp_link, link)
            except OSError:
                pass
        for d in self.dir.glob("last-*"):
            if d != path and d.is_dir():
                shutil.rmtree(d, ignore_errors=True)
        return str(path)

    def latest_for_resume(self) -> Optional[str]:
        js = self.dir / "last_step.json"
        if js.exists():
            try:
                p = json.loads(js.read_text()).get("path", "")
                if p and Path(p).exists():
                    return p
            except (json.JSONDecodeError, OSError):
                pass
        p = self.dir / "last"  # legacy layout
        return str(p) if p.exists() else None

    def best_for(self, metric: str) -> Optional[str]:
        for m in self.monitors:
            if m.metric == metric:
                return m.best_path()
        return None
