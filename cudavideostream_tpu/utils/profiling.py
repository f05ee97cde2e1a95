"""Profiling/tracing helpers — parity with the reference's nvprof wiring
(``make prof`` -> ``sudo nvprof ./server``, server/Makefile:58-59, and
the awk extraction in ``tests/*/kernel_test.sh``).

On TPU the equivalents are ``jax.profiler`` xplane traces (viewable in
TensorBoard/XProf) plus the amortized wall-clock harness in
:mod:`cudavideostream_tpu.utils.timing`.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cvstpu_trace") -> Iterator[str]:
    """Capture a jax.profiler trace around a code block.

    Usage::

        with profiling.trace("/tmp/t") as d:
            run_frames()
        # xplane protobufs under d, load with xprof/tensorboard
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span visible in the trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class FrameProfiler:
    """Rolling per-stage wall-clock stats for the streaming loop,
    printable in the same spirit as the reference's 1 Hz line."""

    def __init__(self, window: int = 120):
        self.window = window
        self.samples: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            buf = self.samples.setdefault(name, [])
            buf.append(time.perf_counter() - t0)
            if len(buf) > self.window:
                del buf[: len(buf) - self.window]

    def summary(self) -> str:
        parts = []
        for name, buf in sorted(self.samples.items()):
            if buf:
                mean = 1e3 * sum(buf) / len(buf)
                worst = 1e3 * max(buf)
                parts.append(f"{name}: {mean:.2f}ms (max {worst:.2f})")
        return " | ".join(parts)
