"""Mesh construction helpers.

One 1-D data axis is all these workloads need: MSM partitions points,
NTT partitions matrix rows.  ICI is used within a slice automatically by
XLA's collective lowering; multi-host extends the same mesh over DCN via
`jax.distributed.initialize` (callers do that before building the mesh).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def shard_axis() -> str:
    return SHARD_AXIS


def default_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def data_sharding(mesh: Mesh, axis_index: int, ndim: int) -> NamedSharding:
    """NamedSharding that splits array axis ``axis_index`` across the mesh."""
    spec = [None] * ndim
    spec[axis_index] = SHARD_AXIS
    return NamedSharding(mesh, P(*spec))
