"""Device profiling helpers.

The reference's observability is wall-clock running averages
(timer_utils.hpp) plus per-scan match-rate log lines
(ros_interface.cc:391-394).  On TPU we add jax.profiler traces and a
per-stage device-time report built from repeated timed executions.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict

import jax
from .timing import sync as _sync


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/legkilo_trace"):
    """Capture a jax.profiler trace around a block (view with TensorBoard
    or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall time of a jitted callable, synchronized."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class ScanStats:
    """Per-scan counters (match ratio, drops) aggregated for reporting.

    Parity with the reference's per-scan INFO lines: raw size, downsampled
    size, "useful pcl percent" (ros_interface.cc:391-394).
    """

    def __init__(self) -> None:
        self.scans = 0
        self.total_points = 0
        self.total_matched = 0
        self.total_raw = 0
        self.dropped_points = 0
        self.dropped_events = 0

    def update(self, n_raw: int, n_points: int, n_matched: int,
               dropped_points: int = 0, dropped_events: int = 0) -> None:
        self.scans += 1
        self.total_raw += n_raw
        self.total_points += n_points
        self.total_matched += n_matched
        self.dropped_points += dropped_points
        self.dropped_events += dropped_events

    @property
    def match_ratio(self) -> float:
        return self.total_matched / max(self.total_points, 1)

    def report(self) -> Dict:
        return {
            "scans": self.scans,
            "avg_raw": self.total_raw / max(self.scans, 1),
            "avg_down": self.total_points / max(self.scans, 1),
            "match_ratio": round(self.match_ratio, 4),
            "dropped_points": self.dropped_points,
            "dropped_events": self.dropped_events,
        }

    def __str__(self) -> str:
        return json.dumps(self.report())
