"""Tracing / profiling utilities (SURVEY.md §5 row 1).

The reference only wall-clocks the whole render (main.cpp:65-70) and ships
dead CUDA-event helpers (cuda_utils.cu:76-92). Here:

- `timed` / `Timer`: wall-clock scopes with device sync (block_until_ready)
- `trace`: context manager around jax.profiler for Perfetto traces
- `RenderStats` (engine.wavefront) carries the Mrays/s counters; this module
  adds per-stage accounting used by bench/diagnostics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax

from path_tracer_ai_tpu.utils.logging import get_logger

log = get_logger(__name__)


class Timer:
    """Accumulating named wall-clock sections with device synchronization."""

    def __init__(self):
        self.sections: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.sections[name] = self.sections.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.sections.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total*1e3:.1f} ms total, {n} calls, "
                         f"{total/n*1e3:.2f} ms/call")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pt_trace"):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("Profiler trace written to %s", log_dir)


def timed(fn, *args, n: int = 3, warmup: int = 1, **kw):
    """Time a jitted callable with compile excluded; returns (result, s/call)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kw)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(n):
        result = fn(*args, **kw)
    jax.block_until_ready(result)
    return result, (time.perf_counter() - t0) / n
