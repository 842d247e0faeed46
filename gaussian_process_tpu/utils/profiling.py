"""Tracing / profiling instrumentation.

The reference has none — not even ``time.time()`` (SURVEY.md §6). TPU-native
plan (SURVEY.md §5): ``jax.named_scope`` around the hot phases so xprof traces
show kernel-build / factorize / solve as named regions, ``jax.profiler.trace``
for on-demand trace capture, and ``block_until_ready``-bracketed wall-clock
timers for honest device timings in the bench harness.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax


# Re-export: annotate compiled regions; shows up in xprof/XLA HLO metadata.
named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block(x: Any) -> None:
    jax.tree_util.tree_map(
        lambda leaf: leaf.block_until_ready() if hasattr(leaf, "block_until_ready") else leaf,
        x,
    )


def time_fn(
    fn: Callable[..., Any],
    *args: Any,
    warmup: int = 2,
    iters: int = 5,
    **kwargs: Any,
) -> Dict[str, float]:
    """Wall-clock a (usually jitted) function with compile excluded.

    Runs ``warmup`` untimed calls (first one pays compilation), then ``iters``
    timed calls, each bracketed by ``block_until_ready`` so asynchronous
    dispatch can't fake a fast time. Returns mean/min/std seconds.
    """
    for _ in range(max(warmup, 1)):
        _block(fn(*args, **kwargs))
    times: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    n = len(times)
    mean = sum(times) / n
    var = sum((t - mean) ** 2 for t in times) / n
    return {"mean_s": mean, "min_s": min(times), "std_s": var ** 0.5, "iters": n}


class Stopwatch:
    """Accumulating named phase timer for host-side orchestration code."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *, block: Optional[Any] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                _block(block)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name]}
            for name in self.totals
        }
