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

    def header(self, **fields):
        """One non-step record at the head of the stream (run metadata:
        resolved perf knobs, config digests — anything a reader needs to
        reproduce the run's numerics from artifacts)."""
        if self._f is None:
            return
        rec = {"header": True, "time": time.time()}
        rec.update(fields)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

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


class BoundedTrace:
    """jax.profiler capture of the first N steps of a loop (an unbounded
    multi-epoch trace grows to GBs and is held in memory until stop).

    Usage::

        bt = BoundedTrace(log_dir, n_steps)   # starts if log_dir truthy
        for ...: step(); bt.maybe_stop(total_steps, sync=state)
        ...
        finally: bt.stop()
    """

    def __init__(self, log_dir: str | None, n_steps: int):
        self.log_dir = log_dir or None
        self.n_steps = int(n_steps)
        self.active = False
        if self.log_dir:
            import jax

            jax.profiler.start_trace(self.log_dir)
            self.active = True

    def maybe_stop(self, step: int, sync=None) -> bool:
        """Stop once ``step`` reaches the bound; returns True if it stopped
        on this call. ``sync`` (any pytree) is block_until_ready'd first so
        the trace contains completed device work."""
        if not self.active or step < self.n_steps:
            return False
        import jax

        if sync is not None:
            jax.block_until_ready(sync)
        jax.profiler.stop_trace()
        self.active = False
        return True

    def stop(self):
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False
