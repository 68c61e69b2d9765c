"""Multi-host (multi-slice) initialization.

The reference is single-process/single-device (SURVEY.md §2 checklist); this
is the TPU-native scale-out path: ``jax.distributed.initialize`` connects the
per-host processes, after which ``jax.devices()`` spans the full pod slice
and the same ``Mesh``-based code (parallel/mesh.py, parallel/sp.py) runs
unchanged — XLA routes intra-slice collectives over ICI and inter-slice over
DCN.

Per-host input pipelines must feed disjoint batch shards; ``host_batch_slice``
gives each process its slice of the global batch, and
``global_array_from_host_shards`` assembles the sharded global array.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Connect this host into the JAX distributed system. No-ops when the
    environment provides the coordination config (GKE/Cloud TPU runtime)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logging.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def host_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of the global batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_array_from_host_shards(mesh: Mesh, host_data: np.ndarray,
                                  global_batch: int):
    """Assemble a dp-sharded global array from per-host batch shards."""
    shape = (global_batch,) + host_data.shape[1:]
    sharding = NamedSharding(mesh, P("dp"))
    return jax.make_array_from_process_local_data(sharding, host_data, shape)
