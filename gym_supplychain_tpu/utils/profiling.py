"""Tracing / profiling hooks (SURVEY.md §5: reference has only TODO comments).

Thin wrappers over ``jax.profiler`` plus a steps/s meter; step kernels are
annotated with ``jax.named_scope`` phases so device traces group by
simulation phase.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional

import jax

__all__ = ["trace", "Throughput", "log_metrics"]


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a device trace viewable in TensorBoard/XProf (no-op if
    ``logdir`` is falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """env-steps/s meter over a sliding window."""

    def __init__(self, batch_size: int):
        self.B = batch_size
        self.t0 = time.perf_counter()
        self.steps = 0

    def update(self, n_steps: int = 1) -> float:
        self.steps += n_steps
        dt = time.perf_counter() - self.t0
        return self.B * self.steps / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0


def log_metrics(step: int, metrics: dict, stream=None):
    """One JSONL metrics line per call."""
    if stream is None:
        stream = sys.stdout      # late-bound: respects redirection/capture
    row = {"step": step}
    for k, v in metrics.items():
        try:
            row[k] = float(v)
        except (TypeError, ValueError):
            row[k] = v
    stream.write(json.dumps(row) + "\n")
    stream.flush()
