"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over local devices (multi-host: global devices)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def feasible_device_count(batch_size: int, available: Optional[int] = None) -> int:
    """Largest device count ≤ available that divides the frame batch."""
    if available is None:
        available = len(jax.devices())
    n = min(available, batch_size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return max(n, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (frame) axis of every leaf."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put a host pytree with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
