"""Evaluation: test-set inference + metrics, minipig transfer, reports."""

from .inference import aggregate_report, load_trainer_state, run_inference
from .minipig import run_minipig_inference

__all__ = [
    "run_inference",
    "aggregate_report",
    "load_trainer_state",
    "run_minipig_inference",
]
