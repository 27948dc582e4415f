"""Run logging: JSONL metrics + TensorBoard events + console.

Framework-first observability replacing the reference's Lightning
self.log(...)/TensorBoardLogger combo (GAN_final.py:266-295, 446): every
train-step metric goes to a machine-readable metrics.jsonl, mirrored into a
TensorBoard event file, and periodically to stdout.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

from .tb_writer import TBWriter


class MetricLogger:
    def __init__(self, log_dir, tb: bool = True, echo_every: int = 10,
                 resume: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        # resume=False truncates: a fresh (--no-resume) run must not append
        # after a previous run's rows — overlapping step numbers corrupt
        # loss-curve rendering and any per-step analysis of the file
        self._jsonl = open(self.log_dir / "metrics.jsonl",
                           "a" if resume else "w")
        self._tb: Optional[TBWriter] = TBWriter(self.log_dir) if tb else None
        self.echo_every = echo_every
        self._t_last = time.time()

    def log_metrics(self, metrics: Dict[str, float], step: int,
                    prefix: str = "") -> None:
        now = time.time()
        rec = {"step": int(step), "time": now}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.scalar(key, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self.echo_every and step % self.echo_every == 0:
            dt = now - self._t_last
            self._t_last = now
            msg = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            print(f"step {step} [{dt:6.2f}s] {msg}", flush=True)

    def log_volume(self, tag: str, vol, step: int) -> None:
        if self._tb is not None:
            self._tb.volume_slices(tag, vol, step)
            # reference also logs an axial-sweep animated GIF per epoch
            # (test_runs/GAN.py:455-462, add_animated_gif(max_out=300))
            self._tb.animated_gif(f"{tag}/gif", vol, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
