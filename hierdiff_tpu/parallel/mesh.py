"""Device mesh + sharding helpers.

The reference's entire distributed layer (PL DDP + NCCL, SURVEY §2.5)
collapses into a 1-D ``data`` mesh here: batches are sharded over the mesh,
parameters replicated, and XLA inserts the gradient all-reduce over ICI
automatically from the sharding annotations on the jitted train step.
Multi-host growth is ``jax.distributed.initialize`` + the same mesh over all
processes' devices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Multi-host (multi-slice over DCN) initialization + global data mesh.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters. After this, ``jax.devices()``
    spans all hosts and the returned mesh runs gradient all-reduce over
    ICI within a slice and DCN across slices — the growth path the
    reference delegated to PL DDP/NCCL (SURVEY §2.5).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return make_mesh()


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host batch pytree with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, opt state) over the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
