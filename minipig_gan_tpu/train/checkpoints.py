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


def save_state(path, state: GANTrainState, cfg: Optional[Config] = None) -> None:
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", state)
    ckptr.wait_until_finished()
    if cfg is not None:
        (path / "config.json").write_text(to_json(cfg))


def restore_state(path, abstract_state: GANTrainState) -> GANTrainState:
    """Restore with an abstract target (from GANTrainer.init on dummy data)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path / "state", abstract_state)


def load_config(path) -> Config:
    from ..config import from_json

    return from_json((Path(path) / "config.json").read_text())


@dataclass
class Monitor:
    """One monitored quantity (mode=min), like a Lightning ModelCheckpoint."""

    metric: str
    prefix: str
    best: float = float("inf")
    best_path: Optional[str] = None


class TopKCheckpointManager:
    """Keeps the best checkpoint per monitor (save_top_k=1 x 3 monitors,
    GAN_final.py:448-472) plus a rolling `last` for resume."""

    def __init__(self, ckpt_dir, cfg: Optional[Config] = None,
                 monitors: Optional[List[Tuple[str, str]]] = None):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        monitors = monitors or [
            ("g_loss", "gen"),
            ("g_recon_loss", "gen_recon"),
            ("d_loss", "dis"),
        ]
        self.monitors = [Monitor(metric=m, prefix=p) for m, p in monitors]
        self._load_index()

    def _index_path(self) -> Path:
        return self.dir / "index.json"

    def _load_index(self) -> None:
        if self._index_path().exists():
            data = json.loads(self._index_path().read_text())
            for mon in self.monitors:
                if mon.metric in data:
                    mon.best = data[mon.metric]["best"]
                    mon.best_path = data[mon.metric]["path"]

    def _save_index(self) -> None:
        self._index_path().write_text(json.dumps({
            m.metric: {"best": m.best, "path": m.best_path}
            for m in self.monitors
        }, indent=2))

    def maybe_save(self, state: GANTrainState, metrics: Dict[str, float],
                   step: int) -> List[str]:
        """Check every monitor; save under a loss-valued name on improvement."""
        saved = []
        for mon in self.monitors:
            if mon.metric not in metrics:
                continue
            val = float(metrics[mon.metric])
            if val < mon.best:
                parts = [f"{mon.prefix}_step={step}"]
                for k in ("g_loss", "g_recon_loss", "d_loss"):
                    if k in metrics:
                        parts.append(f"{k}={float(metrics[k]):.2f}")
                name = "-".join(parts)
                path = self.dir / name
                save_state(path, state, self.cfg)
                if mon.best_path and Path(mon.best_path).exists() and not any(
                    m.best_path == mon.best_path for m in self.monitors
                    if m is not mon
                ):
                    shutil.rmtree(mon.best_path, ignore_errors=True)
                mon.best = val
                mon.best_path = str(path)
                saved.append(str(path))
        if saved:
            self._save_index()
        return saved

    def save_last(self, state: GANTrainState, step: int) -> str:
        path = self.dir / "last"
        save_state(path, state, self.cfg)
        (self.dir / "last_step.json").write_text(json.dumps({"step": int(step)}))
        return str(path)

    def latest_for_resume(self) -> Optional[str]:
        p = self.dir / "last"
        return str(p) if p.exists() else None

    def best_for(self, metric: str) -> Optional[str]:
        for m in self.monitors:
            if m.metric == metric:
                return m.best_path
        return None
