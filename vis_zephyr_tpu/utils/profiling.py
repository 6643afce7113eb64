"""Profiling + tracing as a first-class module.

The reference has only an inline wall-clock benchmark block
(`vis_zephyr/train/train.py:856-927`) and debug leftovers that serialize
the GPU (`serve/cli.py:197-198`, SURVEY §5.1). Here:

- `profile_to` / `trace_region` wrap `jax.profiler` (XLA traces viewable in
  TensorBoard / xprof),
- `StepTimer` measures steady-state step latency with warmup discard and
  percentile summaries, using a true device sync (on tunneled platforms
  `block_until_ready` may return early, so a scalar fetch is used).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


def device_sync(x) -> None:
    """Block until `x` is actually computed (scalar-fetch round trip)."""
    leaf = jax.tree_util.tree_leaves(x)[-1]
    jax.device_get(jnp.ravel(jnp.asarray(leaf))[0])


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture an XLA profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def trace_region(name: str):
    """Annotate a region in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Accumulates per-step wall times; first `warmup` steps are discarded
    (compile + cache effects)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            device_sync(sync_on)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        return {
            "steps": len(ts),
            "mean_s": statistics.fmean(ts),
            "p50_s": ts[len(ts) // 2],
            "p90_s": ts[int(len(ts) * 0.9)],
            "min_s": ts[0],
            "max_s": ts[-1],
        }
