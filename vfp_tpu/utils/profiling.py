"""Profiling hooks: jax.profiler traces + per-stage throughput counters.

The reference's only instrumentation is a wall-clock print
(reference: tests/segment_mark_detect_hls.py:505-514); here pipelines report
per-stage seconds and the whole program can be captured with the JAX
profiler for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with xprof/TB)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StageTimer:
    """Accumulates wall seconds and item counts per named stage."""

    def __init__(self):
        self.seconds = defaultdict(float)
        self.items = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.items[name] += items

    def report(self) -> dict:
        return {
            name: {
                "seconds": round(self.seconds[name], 4),
                "items": self.items[name],
                "items_per_sec": round(self.items[name] / self.seconds[name], 2)
                if self.seconds[name]
                else 0.0,
            }
            for name in self.seconds
        }
