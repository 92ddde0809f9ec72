"""Profiling / tracing utilities.

First-class observability the reference lacked (SURVEY.md §5 — it had
only wall-clock prints): a context manager around the JAX profiler
(TensorBoard-compatible traces of XLA ops, host callbacks, transfers)
and a lightweight step timer that records per-stage wall-clock
percentiles without forcing device syncs beyond the ones callers choose.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """jax.profiler trace scope; view with TensorBoard or Perfetto."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named-stage wall-clock accumulator.

    with timer.stage("data"): ...
    with timer.stage("step"): ...
    print(timer.summary())
    """

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, vals in self.records.items():
            a = np.asarray(vals[1:] if len(vals) > 3 else vals)  # drop compile
            out[name] = {
                "mean_ms": float(a.mean() * 1000),
                "p50_ms": float(np.percentile(a, 50) * 1000),
                "p95_ms": float(np.percentile(a, 95) * 1000),
                "count": int(len(vals)),
            }
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


def device_memory_stats() -> Optional[Dict]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
