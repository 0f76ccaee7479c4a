"""Profiling hooks (SURVEY §5 "Tracing / profiling").

The reference has only wall-clock meters; here we add real device tracing via
jax.profiler on top of the same lightweight iter/data meters
(cmx.utils.logging.MetricLogger).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir when given; no-op otherwise."""
    if log_dir:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


class StepTimer:
    """Block-until-ready step timer for honest device timings."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def summary(self, skip_first: int = 1) -> dict:
        ts = self.times[skip_first:] if len(self.times) > skip_first else self.times
        if not ts:
            return {"mean_s": 0.0, "p50_s": 0.0, "min_s": 0.0}
        ss = sorted(ts)
        return {
            "mean_s": sum(ts) / len(ts),
            "p50_s": ss[len(ss) // 2],
            "min_s": ss[0],
        }
