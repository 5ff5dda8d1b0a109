"""Profiling / tracing utilities: step-time meters and XLA trace capture.

The reference ships an unused utils/timer.py (ScopeTimer/TickTock); here the
equivalents are first-class and TPU-aware: a scope timer that blocks on device work,
a throughput meter (images + megapixels/s, the bench north star), and a thin wrapper
over ``jax.profiler.trace`` producing Perfetto-compatible traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class ScopeTimer:
    """with ScopeTimer('fwd') as t: ...  — blocks on async device work at exit."""

    def __init__(self, name: str = "", logger=None, sync=True):
        self.name = name
        self.logger = logger
        self.sync = sync
        self.elapsed = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            # flush any outstanding device work before reading the clock
            jax.effects_barrier()
        self.elapsed = time.perf_counter() - self.t0
        msg = f"{self.name}: {self.elapsed * 1e3:.2f} ms"
        (self.logger.info if self.logger else print)(msg)
        return False


class ThroughputMeter:
    """Sliding-window step-time / MP/s meter for training/inference loops."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = []
        self.pixels = []
        self.items = []
        self._last = None

    def tick(self, n_items: int = 0, n_pixels: int = 0):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            self.items.append(n_items)
            self.pixels.append(n_pixels)
            if len(self.times) > self.window:
                self.times.pop(0)
                self.items.pop(0)
                self.pixels.pop(0)
        self._last = now

    @property
    def step_time(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def items_per_sec(self) -> float:
        t = sum(self.times)
        return sum(self.items) / t if t else 0.0

    @property
    def megapixels_per_sec(self) -> float:
        t = sum(self.times)
        return sum(self.pixels) / 1e6 / t if t else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str] = "/tmp/jax-trace"):
    """Capture an XLA/TPU profile viewable in Perfetto / TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
