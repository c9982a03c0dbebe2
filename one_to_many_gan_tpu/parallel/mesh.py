"""Device mesh + sharding layer (new capability; SURVEY.md §2 accounting).

The reference is strictly single-GPU (no torch.distributed anywhere).
This layer adds the TPU-native scale-out path: a 2-axis
``jax.sharding.Mesh`` ("data", "spatial") with

- **data parallelism**: the batch axis of every image tensor is sharded
  over "data"; parameters/optimizer/ADA/buffer state are replicated.
  Gradient and global-scalar reductions (the KL loss's global-batch
  statistics, the ADA sign mean) are inserted automatically by XLA's SPMD
  partitioner because the train step is written on global arrays.
- **spatial parallelism** (for large resolutions): the image height axis
  is additionally sharded over "spatial"; XLA inserts halo exchanges for
  the convolutions over ICI.

On multi-host deployments, call ``jax.distributed.initialize()`` first and
feed per-host data shards (data/pipeline.py host_id/host_count); the mesh
spans all processes' devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    data_parallel: int = -1, spatial_parallel: int = 1, devices=None
) -> Mesh:
    """Build the ("data", "spatial") mesh.

    ``data_parallel == -1`` takes every available device not used by the
    spatial axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial_parallel < 1 or n % spatial_parallel != 0:
        msg = f"spatial_parallel={spatial_parallel} must divide device count {n}"
        raise ValueError(msg)
    if data_parallel == -1:
        data_parallel = n // spatial_parallel
    needed = data_parallel * spatial_parallel
    if needed > n:
        msg = f"mesh {data_parallel}x{spatial_parallel} needs {needed} devices, have {n}"
        raise ValueError(msg)
    grid = np.asarray(devices[:needed]).reshape(data_parallel, spatial_parallel)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Images [B, H, W, C]: batch over data, height over spatial."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Host batch -> globally sharded device array.

    Single-process: one device_put. Multi-process (the mesh spans hosts):
    ``batch`` is this process's LOCAL shard — the rows of the global batch
    this host loaded (data/pipeline.py host_id/host_count) — assembled
    into a global array without any cross-host data movement.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(batch))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh.

    Multi-process: every process must hold the same values (deterministic
    init from the same seed guarantees this); each contributes its full
    copy as the process-local data of a fully-replicated global array.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)
