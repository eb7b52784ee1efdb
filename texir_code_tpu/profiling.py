"""Profiling & observability: step timers, throughput counters, traces.

The reference's only instrumentation is a per-batch wall-clock print
(trainer/train_material.py:462-464).  Here throughput (rays/s, texels/s —
the BASELINE.json headline metrics) is first-class, and the JAX profiler is
one context manager away:

    with trace("/tmp/tb"):          # open in TensorBoard → Profile
        run_step()

    timer = StepTimer()
    with timer.measure(rays=1_570_000):
        step()
    print(timer.summary())          # iters/s, Mrays/s, p50/p95 step time
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard's Profile tab)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with work counters."""

    def __init__(self):
        self.times: List[float] = []
        self.work: Dict[str, float] = {}

    @contextlib.contextmanager
    def measure(self, **counts: float):
        """Time one step; counts (rays=..., texels=..., pixels=...) accumulate."""
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        for k, v in counts.items():
            self.work[k] = self.work.get(k, 0.0) + v

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        total = float(t.sum())
        out = {
            "steps": len(t),
            "iters_per_s": len(t) / total,
            "step_p50_ms": float(np.percentile(t, 50) * 1e3),
            "step_p95_ms": float(np.percentile(t, 95) * 1e3),
        }
        for k, v in self.work.items():
            out[f"{k}_per_s"] = v / total
            if v / total > 1e6:
                out[f"M{k}_per_s"] = v / total / 1e6
        return out
