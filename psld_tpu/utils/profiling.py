"""Tracing / profiling / metrics (SURVEY.md section 5).

The reference has no tracing beyond Lightning's progress bar; here we wire
the TPU-native equivalents: ``jax.profiler`` trace capture around selected
steps, a per-step timing aggregator, and a JSONL metrics logger (the
reference declares wandb but never imports it, Pipfile:13 -- a file logger
keeps parity without the dependency).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


class StepTimer:
    """Wall-clock aggregation per named phase (data / step / ckpt ...)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name]
                                 / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }


class MetricsLogger:
    """Append-only JSONL metrics stream (one object per logged step)."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, **metrics):
        if self._f is None:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace (view with TensorBoard / xprof).

    Usage: ``with profiling.trace("/tmp/trace"): run_steps()``; no-op when
    ``log_dir`` is falsy.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
