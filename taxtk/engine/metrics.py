"""Engine observability: run metrics + optional jax profiler traces.

Replaces the reference's StopWatchCPUTime/STATS plumbing
(reference: core/src/profiling.hh, taxonpredictionmodelsequence.hh:837) at
batch granularity: per-round pair/cell counters, wall times per stage, and
a one-line summary suitable for stderr.  `profile()` wraps a region in a
jax.profiler trace for TPU timeline inspection.
"""

from __future__ import annotations

import contextlib
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class EngineMetrics:
    record_sets: int = 0
    pairs: int = 0
    stage_seconds: Dict[str, float] = field(default_factory=dict)
    _t0: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.stage_seconds[name] = self.stage_seconds.get(name, 0.0) + (
                time.time() - t
            )

    def summary(self) -> str:
        total = time.time() - self._t0
        stages = " ".join(
            f"{k}={v:.2f}s" for k, v in sorted(self.stage_seconds.items())
        )
        return (
            f"taxtk: {self.record_sets} record sets, {self.pairs} realignments "
            f"in {total:.2f}s ({stages})"
        )

    def report(self, stream=sys.stderr):
        print(self.summary(), file=stream)


@contextlib.contextmanager
def profile(trace_dir: Optional[str]):
    """jax.profiler trace around a region (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
