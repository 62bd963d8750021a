"""Profiling and tracing subsystem.

The reference has no tracing at all (SURVEY.md §5) — only wall-clock step
timing in the trainer. Here profiling is a first-class utility:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace (XLA ops, fusion, HBM traffic).
- :func:`annotate` — named host spans that show up inside device traces.
- :class:`StepTimer` — lightweight step timing with jit-aware blocking,
  percentile summaries, and optional JSONL event log.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace into ``log_dir``."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


def annotate(name: str):
    """Named span visible in profiler traces (no-op cost when not tracing)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentile summaries.

    Use ``with timer.step("train"):`` around device work; pass ``block=`` a
    jax array to wait on (dispatch is async — timing without blocking
    under-reports).
    """

    def __init__(self, log_file: Optional[str] = None):
        self.records: Dict[str, List[float]] = {}
        self.log_file = log_file
        self._fh = open(log_file, "a") if log_file else None

    @contextlib.contextmanager
    def step(self, name: str, block: Any = None):
        t0 = time.perf_counter()
        yield
        if block is not None:
            import jax

            jax.block_until_ready(block)
        dt = time.perf_counter() - t0
        self.records.setdefault(name, []).append(dt)
        if self._fh:
            self._fh.write(json.dumps({"event": name, "seconds": dt,
                                       "ts": time.time()}) + "\n")
            self._fh.flush()

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, times in self.records.items():
            arr = np.asarray(times)
            out[name] = {
                "count": int(arr.size),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
                "total_s": float(arr.sum()),
            }
        return out

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
