"""Multi-host (multi-slice) execution.

SURVEY §2c: within a pod slice, collectives ride ICI via the sharded jitted
steps (parallel/data_parallel.py); across hosts, the standard JAX multi-host
runtime carries state over DCN. No custom backend — `jax.distributed` plus
host-sharded input and `make_array_from_process_local_data` is the whole
story. Single-process remains a degenerate case of the same code paths.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jrr_tpu.parallel import mesh as mesh_lib


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper; no-op when single-process with no
    coordinator configured."""
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def global_mesh(axis: str = mesh_lib.DATA_AXIS) -> Mesh:
    """1-D mesh over ALL devices across hosts (frames sharded globally)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def global_batch_from_local(
    mesh: Mesh, local_tree: Any, axis: str = mesh_lib.DATA_AXIS
) -> Any:
    """Assemble a globally-sharded array from each host's local shard.

    Every host passes its own slice of the global batch (see
    data_parallel.host_shard_slice / BatchLoader's num_hosts/host_id); the
    result is one global jax.Array whose addressable shards are this host's.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_tree,
    )
