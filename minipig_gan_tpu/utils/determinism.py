"""Determinism / race checking for compiled programs.

The reference has no sanitizers; its closest artifact is pinning ITK to one
thread to dodge a host-side race (SURVEY.md §5, test_runs/GAN.py:49-51).
Here the equivalent risk surface is custom kernels (Pallas DMA overlap,
double-buffered prefetch) and nondeterministic reductions. `check_step_determinism`
executes a step function twice from bitwise-identical state and reports any
leaf that diverges — used in CI for the train step and available as a
framework utility for any jit function.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import numpy as np


def diff_trees(a: Any, b: Any) -> Dict[str, float]:
    """Max abs diff per leaf path between two pytrees (same structure)."""
    leaves_a = jax.tree_util.tree_leaves_with_path(a)
    leaves_b = jax.tree.leaves(b)
    out = {}
    for (path, la), lb in zip(leaves_a, leaves_b):
        key = jax.tree_util.keystr(path)
        la = np.asarray(la)
        lb = np.asarray(lb)
        if la.shape != lb.shape:
            out[key] = float("inf")
        elif la.size:
            out[key] = float(np.max(np.abs(la.astype(np.float64)
                                           - lb.astype(np.float64))))
    return out


def check_step_determinism(
    step_fn: Callable, state: Any, batch: Any, tol: float = 0.0
) -> Tuple[bool, Dict[str, float]]:
    """Run `step_fn(state, batch)` twice from the same inputs; return
    (deterministic, divergent-leaf report). Use a non-donating step fn."""
    out1 = jax.device_get(step_fn(state, batch))
    out2 = jax.device_get(step_fn(state, batch))
    diffs = diff_trees(out1, out2)
    bad = {k: v for k, v in diffs.items() if v > tol}
    return (len(bad) == 0), bad
