"""Structured render metrics, NaN surveillance, and profiling hooks.

The reference's only observability is stdlib log lines and a UI FPS label
(SURVEY.md §5); the TPU build upgrades this to structured per-interval
records (pass index, wall-clock, Mrays/s, non-finite count) written to a
JSONL sink (``PATHTRACER_METRICS=<path>`` or a callback), plus a
``jax.profiler`` context for on-demand device traces.

Failure detection (SURVEY.md §5): a pass is a pure function of
(scene, seed, pass index), so the recovery protocol for transient device
faults is detect-nonfinite -> recompute the pass.  ``nonfinite_count``
feeds that check; the renderer exposes it via RenderStats and the metrics
log.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PassRecord", "MetricsLog", "nonfinite_count", "profile_trace"]


@dataclasses.dataclass
class PassRecord:
    pass_index: int
    wall_seconds: float
    ray_segments: int
    mrays_per_sec: float
    nonfinite: int = 0

    def to_json(self) -> str:
        return json.dumps(
            {
                "pass": self.pass_index,
                "wall_s": round(self.wall_seconds, 4),
                "segments": self.ray_segments,
                "mrays_per_sec": round(self.mrays_per_sec, 2),
                "nonfinite": self.nonfinite,
            }
        )


class MetricsLog:
    """Collects per-interval pass records; optionally tees to a JSONL file
    (PATHTRACER_METRICS env var) and/or a callback."""

    def __init__(self, sink: Optional[Callable[[PassRecord], None]] = None):
        self.records: List[PassRecord] = []
        self.sink = sink
        self._path = os.environ.get("PATHTRACER_METRICS", "")
        self._t_last = time.perf_counter()
        self._segs_last = 0

    def interval(self, pass_index: int, total_segments: int, nonfinite: int = 0) -> PassRecord:
        now = time.perf_counter()
        wall = now - self._t_last
        segs = total_segments - self._segs_last
        rec = PassRecord(
            pass_index=pass_index,
            wall_seconds=wall,
            ray_segments=segs,
            mrays_per_sec=(segs / wall / 1e6) if wall > 0 else 0.0,
            nonfinite=nonfinite,
        )
        self._t_last = now
        self._segs_last = total_segments
        self.records.append(rec)
        if self.sink is not None:
            self.sink(rec)
        if self._path:
            with open(self._path, "a", encoding="utf-8") as f:
                f.write(rec.to_json() + "\n")
        return rec


@jax.jit
def nonfinite_count(arr) -> jnp.ndarray:
    """Number of non-finite elements (device-side reduce)."""
    return jnp.sum(~jnp.isfinite(arr), dtype=jnp.int32)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (SURVEY.md §5 tracing upgrade)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
