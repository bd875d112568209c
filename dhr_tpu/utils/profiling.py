"""Phase timing + jax.profiler trace hooks.

The reference's only observability is per-query wall-clock prints
(gip_retrieval.py:82-83 etc.); here every pipeline stage can wrap itself in
:func:`phase` for structured timings, and :func:`trace` captures a
``jax.profiler`` trace viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger("dhr_tpu.profiling")

_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str, log: bool = False):
    """Time a named phase; accumulate into the module report."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _totals[name] += dt
        _counts[name] += 1
        if log:
            logger.info("%s: %.3fs", name, dt)


def report() -> dict[str, dict]:
    return {
        k: {"total_s": _totals[k], "count": _counts[k],
            "mean_s": _totals[k] / _counts[k]}
        for k in _totals
    }


def reset() -> None:
    _totals.clear()
    _counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
