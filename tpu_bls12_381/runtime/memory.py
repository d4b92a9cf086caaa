"""Live device-allocation report — the MemoryTracker analog.

The reference tracks device allocations in a map for leak detection in
debug builds (include/icicle/memory_tracker.h:37-80).  JAX owns the
allocator, so the equivalent observability hook is a live-array census:
what is resident, where, and how large.
"""

from __future__ import annotations

from collections import defaultdict

import jax


def live_arrays_report(top: int = 10) -> str:
    """Human-readable summary of live device arrays (count/bytes/device)."""
    arrays = jax.live_arrays()
    per_device: dict = defaultdict(lambda: [0, 0])
    entries = []
    for a in arrays:
        nbytes = a.size * a.dtype.itemsize
        for d in a.devices():
            per_device[str(d)][0] += 1
            per_device[str(d)][1] += nbytes
        entries.append((nbytes, a.shape, a.dtype))
    entries.sort(reverse=True)
    lines = [f"live arrays: {len(arrays)}"]
    for dev, (cnt, total) in sorted(per_device.items()):
        lines.append(f"  {dev}: {cnt} arrays, {total / 1e6:.1f} MB")
    for nbytes, shape, dtype in entries[:top]:
        lines.append(f"    {nbytes / 1e6:8.1f} MB  {dtype}{list(shape)}")
    return "\n".join(lines)


def total_live_bytes() -> int:
    return sum(a.size * a.dtype.itemsize for a in jax.live_arrays())
