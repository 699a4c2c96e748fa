"""Multi-host initialization and per-host data sharding helpers.

The reference is strictly single-device (SURVEY.md §2.8); this layer is
new design: ``jax.distributed`` initialization for multi-host slices
(collectives ride ICI within a slice, DCN across), and helpers to build
global arrays from per-host shards.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    No-ops (returns False) in single-process settings. Env fallbacks:
    JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if not coordinator or num_processes <= 1:
        return False
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_shard_range(total: int) -> range:
    """This host's contiguous shard of a global work list."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = (total + n - 1) // n
    return range(i * per, min(total, (i + 1) * per))


def global_batch_from_host(batch: dict, mesh) -> dict:
    """Assemble a global device array from this host's local batch.

    With multi-host data parallelism each host feeds its local slice;
    jax.make_array_from_process_local_data builds the logically-global
    array over the 'data' axis.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def make(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return {k: make(v) for k, v in batch.items()}
