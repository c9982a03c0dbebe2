"""Multi-host (DCN) initialization helpers.

The reference is single-process/single-GPU (SURVEY.md §2: no
torch.distributed anywhere); this module provides the TPU-native
multi-host entry: ``jax.distributed.initialize`` + per-host dataset
sharding hooks. Within a slice, collectives ride ICI via the mesh
(parallel/mesh.py); across hosts, DCN. The Trainer already passes
``jax.process_index()/process_count()`` into the input pipeline so each
host draws a disjoint shard of every epoch.

Usage on a multi-host TPU pod slice (one process per host):

    from one_to_many_gan_tpu.parallel import distributed
    distributed.ensure_initialized()   # no-op single-process
    train(config)                      # mesh spans all hosts' devices
"""

from __future__ import annotations

import os

import jax

_initialized = False


def ensure_initialized(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed when running multi-process.

    No-op when single-process (the common single-host case) or when
    already initialized. On TPU pods the arguments are discovered from the
    environment automatically; they can be forced explicitly for other
    setups.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address is not None
    env_hint = any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not (explicit or env_hint):
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(local_batch, offset) for this host's slice of a global batch."""
    n = jax.process_count()
    if global_batch % n:
        msg = f"global batch {global_batch} not divisible by {n} hosts"
        raise ValueError(msg)
    local = global_batch // n
    return local, jax.process_index() * local
