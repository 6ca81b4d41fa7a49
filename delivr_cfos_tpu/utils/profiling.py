"""Profiler integration (SURVEY.md §5.1: the reference only has ad-hoc
wall-clock prints; here jax.profiler traces are a first-class switch)."""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax


@contextmanager
def trace(trace_dir: str | None = None):
    """Capture a jax.profiler trace (TensorBoard format) around a block.
    Enabled when ``trace_dir`` (or $DELIVR_TRACE_DIR) is set; no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("DELIVR_TRACE_DIR")
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name: str):
    """Named region in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
