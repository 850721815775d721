"""Progress + metrics logging.

The reference prints an in-place unicode progress bar and raw floats
(`/root/reference/utils.py:17-23`). Here: the same style of in-place bar for
interactive runs, plus a structured JSONL metrics log for machines, and a
step timer for throughput accounting.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


def progressbar(done: int, total: int, width: int = 30) -> str:
    filled = int(width * done / max(total, 1))
    return f"[{'█' * filled}{'░' * (width - filled)}] {done}/{total}"


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None, print_every: int = 50):
        self.jsonl_path = jsonl_path
        self.print_every = print_every
        self._file = open(jsonl_path, "a") if jsonl_path else None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        """Record (and print) one metrics snapshot.

        Callers throttle how often they call this (the trainers gate on
        their per-epoch batch counter against ``print_every``); gating again
        here on ``step % print_every`` would silently drop most output the
        moment the two counters desynchronize, so every call prints.
        """
        record = {"step": int(step), "prefix": prefix}
        record.update({k: float(v) for k, v in metrics.items()})
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        parts = "  ".join(f"{k}: {float(v):.5f}" for k, v in metrics.items())
        print(f"\r{prefix} step {step}  {parts}", end="", file=sys.stderr)

    def close(self):
        if self._file:
            self._file.close()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion (compile steps)."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._t = None
        self._n = 0

    def tick(self):
        now = time.perf_counter()
        if self._t is not None:
            self._n += 1
            if self._n > self.warmup:
                self.times.append(now - self._t)
        self._t = now

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
