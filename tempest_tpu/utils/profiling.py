"""Observability: first-class throughput metrics and device profiling.

The reference's observability is ad-hoc: wall-clock ``Rate`` meters printed
at exit (``AtomicAbstractSDRs.jl:199-268,333-341``) and FPS ``@info`` lines
(``GUI.jl:201-203``).  Here metrics are a structured API (the ring's
``RateMeter`` feeds this registry) and device-side profiling delegates to
``jax.profiler`` traces viewable in XProf/TensorBoard (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import time

__all__ = ["Metrics", "trace", "annotate"]


class Metrics:
    """Lightweight metric registry: counters + gauges + derived rates."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()
        self.counters: dict[str, float] = {}
        self.gauges: dict[str, float] = {}

    def count(self, name: str, inc: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + inc

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = value

    def rate(self, name: str) -> float:
        """Counter per second since creation."""
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self.counters.get(name, 0.0) / dt

    def snapshot(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "uptime_s": dt,
            "counters": dict(self.counters),
            "rates_per_s": {k: v / dt for k, v in self.counters.items()},
            "gauges": dict(self.gauges),
        }

    def json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` device trace for the enclosed block:

    >>> with trace("/tmp/tt_trace"):
    ...     step(iq, ema, alpha)

    View with TensorBoard/XProf pointed at ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
