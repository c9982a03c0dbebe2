"""Parallelism: device mesh, shardings, multi-host helpers."""

from one_to_many_gan_tpu.parallel import distributed
from one_to_many_gan_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "distributed",
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
