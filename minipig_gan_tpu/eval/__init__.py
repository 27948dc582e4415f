"""Evaluation: test-set inference + metrics, minipig transfer, reports."""

from .inference import aggregate_report, load_trainer_state, run_inference
from .minipig import run_minipig_inference
from .report import (
    boxplot_png,
    inference_review,
    ratio_pct,
    review_html,
    snapshot_png,
    summarize,
)

__all__ = [
    "run_inference",
    "aggregate_report",
    "load_trainer_state",
    "run_minipig_inference",
    "review_html",
    "inference_review",
    "snapshot_png",
    "boxplot_png",
    "summarize",
    "ratio_pct",
]
