"""Multi-host initialization + per-host data utilities.

The reference's multi-node story is one NCCL process per GPU launched by
torch.distributed.launch with MASTER_ADDR/PORT env rendezvous
(run_scripts/*.sh:10-19). The TPU-native story is one process per host:
``jax.distributed.initialize()`` discovers the topology (TPU metadata or
coordinator env vars), the mesh spans all chips globally, and per-host input
slices assemble into global arrays.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if needed. Safe to call single-host (no-op).

    Env fallbacks: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    (and TPU pod metadata is autodetected by jax.distributed).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single host or TPU-pod autodetect
        try:
            jax.distributed.initialize()
            logger.info("jax.distributed initialized (autodetect): "
                        "process %d/%d", jax.process_index(), jax.process_count())
            return True
        except Exception:
            return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())
    return True


def global_batch_from_host_batch(host_batch, mesh):
    """Assemble a per-host numpy batch into a global sharded jax.Array
    (multi-host path; single-host this is just device_put)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(host_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, host_batch)
