"""Timing spans gated by MIDNIGHT_TRACE (the trace-msm/trace-fft analog).

The reference gates `std::time::Instant` timers behind cargo features
(Cargo.toml:44-46) surfaced via RUST_LOG; here a span is a context
manager that logs wall time when its tag is enabled, and optionally
feeds `jax.profiler` trace annotations for TPU profiling.
"""

from __future__ import annotations

import contextlib
import logging
import time

from .config import config

logger = logging.getLogger("tpu_bls12_381.trace")


@contextlib.contextmanager
def span(tag: str, label: str):
    """Time a region when tracing `tag` is enabled; no-op otherwise."""
    if not config().traces(tag):
        yield
        return
    import jax.profiler

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(label):
        yield
    logger.info("%s: %.3f ms", label, (time.perf_counter() - t0) * 1e3)
