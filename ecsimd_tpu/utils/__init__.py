"""Observability helpers.

The reference has no tracing/profiling subsystem (SURVEY.md §5 — its only
perf tooling is benchmark hygiene); on TPU the native tool is the XLA
profiler, wrapped here for convenience.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ecsimd_tpu_trace"):
    """Capture an XLA profiler trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sync=None):
    """Wall-clock a block; pass ``sync=array`` to block on device results."""
    import jax

    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        box["seconds"] = time.perf_counter() - t0
        if label:
            print(f"[{label}] {box['seconds']*1e3:.2f} ms")
