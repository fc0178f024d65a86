"""Per-stage running-average wall timing.

Parity: Timer (/root/reference/legkilo/src/common/timer_utils.hpp:15-61) —
a process-wide singleton accumulating running-average wall time per label,
dumped at exit (leg_kilo_node.cc:45).  Used as a context manager:

    with Timer.measure("Downsampling"):
        ...
    Timer.log_all_average_time()
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

log = logging.getLogger(__name__)


def sync(tree) -> None:
    """Real execution barrier for timing loops.

    The round-4 tunnel rig's PJRT client resolves jax.block_until_ready
    WITHOUT waiting for execution (measured: block on a 100 MB carry
    returns in ~0 s while np.asarray of a 3-float output of the same
    program waits 22 s) — loops synced with block_until_ready measure
    the ENQUEUE rate, not execution (docs/PERF_NOTES.md "Round-4 rig").
    Materializing one small leaf to the host is a true transitive
    barrier on every rig; prefer this in ALL timed regions.
    """
    import jax
    import numpy as np

    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if not leaves:
        return
    leaf = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(leaf)


class _TimerRegistry:
    def __init__(self) -> None:
        self._avg: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt_ms = (time.perf_counter() - t0) * 1e3
            c = self._count.get(name, 0)
            avg = self._avg.get(name, 0.0)
            self._avg[name] = (avg * c + dt_ms) / (c + 1)
            self._count[name] = c + 1

    def average_ms(self, name: str) -> float:
        return self._avg.get(name, 0.0)

    def count(self, name: str) -> int:
        return self._count.get(name, 0)

    def log_all_average_time(self) -> None:
        for name, avg in sorted(self._avg.items()):
            log.info(">>> Average time of %s: %.3f ms (n=%d)", name, avg, self._count[name])

    def reset(self) -> None:
        self._avg.clear()
        self._count.clear()


Timer = _TimerRegistry()
