"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's only observability is the vendored ``CUDACallback`` logging
per-epoch peak memory and time (``src/stable-diffusion/main.py:395-414``).
Here:
  * ``trace(logdir)`` — capture a ``jax.profiler`` device trace viewable in
    TensorBoard/Perfetto.
  * ``StepTimer`` — wall-clock per-step timing with warmup discard and
    percentile summary, forcing a device readback to defeat async dispatch
    (plain ``block_until_ready`` can be a no-op through remote relays).
  * ``device_memory_stats`` — live/peak HBM per device when the backend
    exposes them.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force execution of everything queued before ``x`` by fetching one
    scalar to the host."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {"mean_s": float(a.mean()), "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)), "steps": len(a)}


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            out[str(d)] = {k: int(v) for k, v in s.items()
                           if "bytes" in k}
    return out
