"""Utilities: logging (JSONL + TensorBoard), profiling, misc."""

from .logging_util import MetricLogger
from .profiling import StepTimer, annotate, trace
from .tb_writer import TBWriter, encode_png

__all__ = ["MetricLogger", "StepTimer", "trace", "annotate", "TBWriter",
           "encode_png"]
