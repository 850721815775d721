"""Profiling & tracing: jax.profiler wrappers and throughput accounting.

The reference has no profiling at all (SURVEY.md §5 — an unused ``import
time``). Here: an XLA trace context that dumps a TensorBoard-compatible
profile, named step annotations, and a throughput meter used by the trainers
and the benchmark harness.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA device trace into ``log_dir`` (no-op when None).

    View with TensorBoard's profile plugin or xprof.
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


def annotate(name: str):
    """Named sub-span inside an active trace (``with annotate("icp"): ...``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Items/sec over a sliding window, compile-warmup excluded."""

    def __init__(self, warmup_steps: int = 1, window: int = 50):
        self.warmup_steps = warmup_steps
        self.window = window
        self._steps = 0
        self._events = []  # (t, items)

    def step(self, items: int = 1) -> None:
        self._steps += 1
        if self._steps <= self.warmup_steps:
            return
        self._events.append((time.perf_counter(), items))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def items_per_sec(self) -> float:
        if len(self._events) < 2:
            return float("nan")
        dt = self._events[-1][0] - self._events[0][0]
        items = sum(n for _, n in self._events[1:])
        return items / dt if dt > 0 else float("nan")

    def summary(self) -> Dict[str, float]:
        return {"items_per_sec": self.items_per_sec, "steps": float(self._steps)}
