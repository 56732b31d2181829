"""Profiling / tracing facilities.

The reference has only hand-rolled std::chrono timers around BA
(backend.cpp:953-963; SURVEY.md §5 'Tracing: no tracer').  Here:
- StageTimer: per-stage wall-clock EMAs surfaced as a dict (what the
  reference logged as one-off RCLCPP lines);
- the native chrome-trace ring buffer (native.NativeTracer) when built;
- device_profile(): context manager around jax.profiler for TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """EMA wall-clock per named stage + counts.  The first sample of each
    stage (jit compile) is recorded separately, not mixed into the EMA."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: Dict[str, float] = {}
        self.first_ms: Dict[str, float] = {}
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            if name not in self.first_ms:
                self.first_ms[name] = dt
            else:
                prev = self.ema_ms.get(name)
                self.ema_ms[name] = dt if prev is None else \
                    (1 - self.alpha) * prev + self.alpha * dt
            self.count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k in self.count:
            entry = dict(count=self.count[k],
                         first_ms=round(self.first_ms.get(k, 0.0), 3))
            if k in self.ema_ms:
                entry["ema_ms"] = round(self.ema_ms[k], 3)
            out[k] = entry
        return out


@contextlib.contextmanager
def device_profile(logdir: Optional[str]):
    """jax.profiler trace (TensorBoard/XProf format) when logdir given."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def make_tracer(capacity: int = 65536):
    """Native chrome-trace recorder, or None when the toolchain is absent."""
    from dynamic_visual_slam_tpu import native
    if native.available():
        return native.NativeTracer(capacity)
    return None
