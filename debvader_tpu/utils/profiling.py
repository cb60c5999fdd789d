"""Tracing / profiling / structured metrics.

The reference has zero observability — 18 bare print() calls and Keras
History objects (SURVEY.md §5).  This module provides:

- ``stage_timer``: wall-clock timing of named pipeline stages with a
  blocking host fetch so asynchronous device work is attributed correctly
  (the runtime in this environment can acknowledge readiness early; see
  bench.py for the same caveat);
- ``trace``: a context manager around ``jax.profiler`` trace capture for
  TensorBoard-viewable device profiles;
- ``MetricsLog``: a tiny append-only structured metrics recorder
  (step -> dict) with JSONL persistence, used by training loops instead of
  prints.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Iterator

import jax

__all__ = ["stage_timer", "trace", "MetricsLog"]


class _StageTimes(dict):
    def report(self) -> str:
        return " ".join(f"{k}={v * 1e3:.1f}ms" for k, v in self.items())


@contextlib.contextmanager
def stage_timer(times: dict, name: str, sync: Any | None = None) -> Iterator[None]:
    """Record wall time of a stage into ``times[name]``.

    Pass ``sync=`` a jax array produced by the stage to block on it before
    stopping the clock.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        times[name] = times.get(name, 0.0) + (time.perf_counter() - t0)


@contextlib.contextmanager
def trace(logdir: str | Path) -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Append-only structured metrics (replaces the reference's prints)."""

    def __init__(self, path: str | Path | None = None):
        self.records: list[dict] = []
        self.path = Path(path) if path else None

    def log(self, step: int, **metrics: float) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def series(self, key: str) -> list[float]:
        return [r[key] for r in self.records if key in r]

    def last(self) -> dict:
        return self.records[-1] if self.records else {}
