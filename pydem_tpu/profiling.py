"""Observability: stage timers and device profiler traces.

The reference has no tracing/profiling beyond log lines (SURVEY §5); this
module provides the TPU-native equivalents: a lightweight stage-timing
registry (used by ProcessManager) and a context manager around
``jax.profiler`` for capturing XLA/TPU traces viewable in TensorBoard or
Perfetto.
"""
from __future__ import annotations

import contextlib
import json
import logging
import time

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-clock per named pipeline stage."""

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            logger.info("stage %s: %.3fs", name, dt)

    def report(self):
        return dict(self.stages)

    def dump(self, fn):
        with open(fn, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def device_trace(logdir="/tmp/pydem_tpu_trace"):
    """Capture a jax profiler trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", logdir)


def annotate(name):
    """Decorator adding a named TraceAnnotation around a function (shows up
    in profiler timelines)."""
    import functools

    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)

        return wrapper

    return deco
