"""Tracing / profiling / numerical-safety hooks.

TPU-native equivalents of the reference's thin observability layer
(SURVEY.md §5): RTF is reported by the synthesis pipeline; this module adds
`jax.profiler` traces, per-stage timers, and NaN guards
(`detect_anomaly` analog via jax_debug_nans / checkify).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

import jax

_log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """The reference's detect_anomaly flag (configs/base.yaml:139)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StageTimer:
    """Accumulating wall-clock stage timer; reports xRT per stage."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, audio_seconds: Optional[float] = None) -> Dict[str, dict]:
        out = {}
        for name, total in self.totals.items():
            entry = {"total_s": total, "count": self.counts[name]}
            if audio_seconds:
                entry["xrt"] = audio_seconds / total if total else float("inf")
            out[name] = entry
        return out


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def log_param_counts(params: dict) -> Dict[str, int]:
    """Parameter-count logging (reference utils/logging_utils.py:12-55)."""
    counts = {k: param_count(v) for k, v in params.items()}
    counts["total"] = sum(counts.values())
    for k, v in counts.items():
        _log.info("params/%s: %s", k, f"{v:,}")
    return counts
