"""Device mesh + sharding utilities (the communication layer).

The reference is single-device with Lightning DDP affordances only
(SURVEY.md §2.8): the honest TPU-native equivalent is data parallelism over
an ICI mesh — parameters replicated, batch sharded, gradients all-reduced by
XLA-inserted collectives under jit. These helpers keep that policy in one
place; nothing else in the framework talks to devices directly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # silent truncation would run a job configured for N chips at
            # a fraction of the intended parallelism with no error ever
            # surfacing (shard_batch still divides) — fail loudly instead,
            # matching sp.py::make_sp_mesh
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every array in a batch pytree with its leading dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
