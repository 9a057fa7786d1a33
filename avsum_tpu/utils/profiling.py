"""Tracing / profiling utilities (SURVEY.md §5.1 — the reference has none).

``annotate`` wraps a region in a ``jax.profiler.TraceAnnotation`` so the
decode / feature / train-step stages show up in a Perfetto trace;
``Timer`` gives ``block_until_ready``-bracketed wall timings for the
frames/sec/chip north-star metric.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax


# active stage collectors (see collect_stages); annotate() feeds every
# registered collector, so bench/serve can attribute wall time per stage
# without threading a timer object through the pipeline
_collectors: list = []


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    start = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if _collectors:
            dt = time.perf_counter() - start
            for c in list(_collectors):
                c[name] = c.get(name, 0.0) + dt


@contextlib.contextmanager
def collect_stages() -> Iterator[Dict[str, float]]:
    """Accumulate {annotate-name: wall seconds} for the enclosed region.

    Note the pipeline overlaps stages across threads (host detection under
    device dispatch), so spans can sum past wall-clock — that overlap is
    exactly what the per-stage breakdown is for.
    """
    acc: Dict[str, float] = {}
    _collectors.append(acc)
    try:
        yield acc
    finally:
        _collectors.remove(acc)


class Timer:
    """Accumulating wall-clock timer; blocks on JAX arrays before stopping."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str, result: Any = None) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def measure(self, name: str, fn: Callable, *args, **kwargs):
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - start
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out, dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in self.totals.items()
        }


def timed(name: Optional[str] = None):
    """Decorator: annotate + time a function call (for coarse host-side spans)."""

    def deco(fn: Callable) -> Callable:
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with annotate(label):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a Perfetto/XPlane trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
