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


def fence(out):
    """Force completion of the computation producing ``out`` and return it.

    ``jax.block_until_ready`` is a NO-OP on the tunneled axon TPU platform
    (observed: a ~1 s device pipeline "blocks" in ~10 ms right after a
    warmup call, making min-over-reps throughput numbers ~100x bogus).
    Device execution is in-order there, so a D2H copy of a few limbs of
    one output leaf is a correct and cheap completion barrier on every
    platform.  All timing harnesses must use this, never block_until_ready.
    """
    import numpy as np
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    # slice EVERY axis: a (1,)*ndim corner is enough to force completion
    # (in-order execution), and keeps the D2H copy a few bytes — the
    # tunneled link moves ~30 MB/s, so fencing a full 1-D leaf (the old
    # ndim-1 slicing) silently added ~200 ms per fence on 2^20 arrays
    # and poisoned every isolated-stage profile.
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
    return out


def timed_reps(reps: int, fn):
    """Best-of-``reps`` wall seconds of ``fn()`` under an honest fence."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best
