"""Profiling hooks — the reference's tracing capability (SURVEY.md §5.1:
host phase timers + DPU cycle counters + [DATA] lines), TPU-native:
``jax.profiler`` traces plus the preserved ``[DATA]`` protocol."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Capture a device trace viewable in TensorBoard/Perfetto. No-op when
    tracing is unavailable (e.g. remote backends without profiler
    support)."""
    logdir = logdir or os.environ.get("PYGIM_TPU_TRACE_DIR", "/tmp/pygim_trace")
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (TraceAnnotation)."""
    import jax

    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
