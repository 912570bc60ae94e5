"""Profiling / tracing utilities.

Replaces the reference's observability tooling (SURVEY.md §5.1):
* `TFSolver.timeline()` Chrome traces (`MID-FC/ocnn_extraction/
  tfsolver.py:148-178`) -> `trace()` context manager around `jax.profiler`
  (view in TensorBoard / Perfetto).
* `TFSolver.param_stats()` (`tfsolver.py:180-195`) -> `param_stats()`.
* Wall-clock data/iter timers live in utils/timer.py.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Dict

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('outputs/trace'): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", log_dir)


def param_stats(params) -> Dict[str, int]:
    """Per-module parameter counts + total (tfsolver param_stats analogue)."""
    import jax

    stats: Dict[str, int] = {}
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        stats[name] = n
        total += n
    stats["__total__"] = total
    for k, v in sorted(stats.items()):
        logging.info("%s: %d", k, v)
    return stats


def annotate(name: str):
    """Named region for traces: `with annotate('graph-rebuild'): ...`."""
    import jax

    return jax.profiler.TraceAnnotation(name)
