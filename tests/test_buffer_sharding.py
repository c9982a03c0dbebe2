"""Compiled-HLO regression guards for per-image collectives (VERDICT r2 #4).

Two step components iterate over the batch axis with sequential
dynamic slices (the replay buffer's fill/swap loop and the ADA warp's
per-image contraction scan). Over a batch-SHARDED axis, the SPMD
partitioner lowers each per-image slice to a cross-device collective —
measured as 140 all-to-all + 348 collective-permute ops in the 8-way
round-2 step HLO (20-second rendezvous stalls in the r01 dryrun tail).

The fixes: buffer_apply all-gathers the stop-gradient'd fakes ONCE via a
sharding constraint and runs the (tiny) loop replicated
(core/buffer.py); the warp scan runs inside shard_map over the data axis
so each device scans only its local images (augment/pipeline.py). These
tests pin both on the lowered HLO text.
"""

import re

import jax
import numpy as np

from one_to_many_gan_tpu.core.buffer import buffer_apply, init_buffer
from one_to_many_gan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def _collective_counts(txt: str) -> dict[str, int]:
    return {
        op: len(re.findall(rf"= \S+ {op}", txt))
        for op in ("all-to-all", "all-gather", "collective-permute")
    }


def test_buffer_hlo_single_gather_under_dp():
    """Isolated sharded buffer program: exactly one upfront all-gather of
    the fakes, no all-to-all, no collectives in the loop body."""
    mesh = make_mesh(8, 1)
    buf = replicate(mesh, init_buffer(16, (16, 16, 1)))
    fakes = shard_batch(mesh, np.random.rand(8, 16, 16, 1).astype(np.float32))
    rng = jax.random.key(0)

    @jax.jit
    def f(b, x, r):
        out, bs = buffer_apply(b, x, r, mesh)
        out = jax.lax.with_sharding_constraint(out, batch_sharding(mesh))
        return out * 2.0, bs

    txt = f.lower(buf, fakes, rng).compile().as_text()
    counts = _collective_counts(txt)
    assert counts["all-to-all"] == 0, counts
    assert counts["collective-permute"] == 0, counts
    assert counts["all-gather"] <= 2, counts  # fakes in, (maybe) out reslice
    # nothing collective inside the sequential loop: the while body must
    # not contain channel_id'd ops
    bodies = re.findall(r"%while[^\n]*body[^{]*\{(.*?)\n\}", txt, re.S)
    for body in bodies:
        assert "channel_id" not in body


def test_warp_hlo_no_per_image_collectives_under_dp():
    """The ADA warp's batch scan under an 8-way data mesh must be local
    per device (shard_map): zero collectives in the whole program."""
    import jax.numpy as jnp

    from one_to_many_gan_tpu.augment.pipeline import warp_bilinear

    mesh = make_mesh(8, 1)
    imgs = shard_batch(mesh, np.random.rand(8, 32, 32, 1).astype(np.float32))
    g = replicate(
        mesh, jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (8, 3, 3))
    )

    @jax.jit
    def f(x, g_inv):
        return warp_bilinear(x, g_inv, antialias=True, mesh=mesh)

    txt = f.lower(imgs, g).compile().as_text()
    counts = _collective_counts(txt)
    assert counts["all-to-all"] == 0, counts
    assert counts["collective-permute"] == 0, counts
