"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5 — tqdm + wall clocks only).
Here: ``step_timer`` wall-clock context with JSONL output through the metric
logger, and ``trace`` wrapping ``jax.profiler`` for TensorBoard-viewable
device traces when supported by the backend.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def step_timer(logger=None, step: int = 0, name: str = "step"):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.log_scalars(step, {f"{name}_seconds": dt})


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace; no-ops gracefully where the backend lacks
    profiler support (e.g. tunneled devices)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside jitted code."""
    return jax.profiler.TraceAnnotation(name)
