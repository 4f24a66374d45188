"""Step-time metrics and profiler hooks.

New capability over the reference (SURVEY §5: the reference only logs
wall-clock ETA). Tracks per-phase wall times (rollout / train / host) with
EMA smoothing, surfaces them as logger stats, and can capture a device trace
via ``jax.profiler`` for offline analysis in XProf/TensorBoard.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Wall-clock phase timing with EMA; ``with timer.phase("rollout"): ...``"""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Dict[str, float] = {}
        self.last: Dict[str, float] = {}
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.note(name, time.perf_counter() - t0)

    def note(self, name: str, dt: float) -> None:
        """Record an externally measured duration (e.g. a multi-block
        dispatch normalized to per-block time)."""
        self.last[name] = dt
        self.count[name] += 1
        if name in self.avg:
            self.avg[name] = self.ema * self.avg[name] + (1 - self.ema) * dt
        else:
            self.avg[name] = dt

    def stats(self) -> Dict[str, float]:
        return {f"time_{k}_ms": v * 1000.0 for k, v in self.avg.items()}


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a jax.profiler device trace into ``log_dir`` when set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
