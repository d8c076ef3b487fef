"""Multi-host initialization (multi-slice / multi-process training).

The reference's distributed story is Lightning-implied DDP (SURVEY.md §2.8);
the TPU-native equivalent is `jax.distributed` over ICI within a slice and
DCN across slices — XLA inserts all collectives. This module is the single
entry point so launchers stay trivial:

    from jyutvoice_tpu.dist.multihost import init_distributed
    init_distributed()  # no-op in single-process runs
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

_log = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if a multi-process runtime was initialized. Args default to
    the standard env vars (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, also auto-detected on Cloud TPU pods).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    single = (
        coordinator_address is None
        and num_processes in (None, 1)
        and not os.environ.get("TPU_WORKER_HOSTNAMES")
    )
    if single:
        _log.info("single-process run: jax.distributed not initialized")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def global_batch_sharding(axis_name: str = "data"):
    """Mesh + sharding over ALL global devices (multi-host data parallel)."""
    from jyutvoice_tpu.dist.mesh import batch_sharding, make_mesh

    mesh = make_mesh(axis_name=axis_name)
    return mesh, batch_sharding(mesh, axis_name)
