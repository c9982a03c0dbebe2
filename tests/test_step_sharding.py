"""Compiled-HLO regression guard: the fused step is reshard-free under DP.

The step's batched-pass fusions (2B discriminator pass, 2B encode, 3B
decode, 2B path extract) originally used ``jnp.concatenate``/``split``
along the batch axis. Under data sharding, those global-contiguous chunk
boundaries do not coincide with each chip's shard, so the SPMD
partitioner moved WHOLE activations over ICI — measured 7.8 GB/chip/step
of collective-permute + 0.7 GB of all-to-all at the production 256² dp=8
point (scripts/collective_budget.py), ~25x the useful gradient traffic.
``batch_pack``/``batch_unpack`` (core/train_step.py) interleave
shard-locally instead, making every fusion a pure local reshape. This
test pins that property on the compiled HLO of the full fused step: the
only collectives allowed under pure data parallelism are the gradient /
global-statistic all-reduces and the replay buffer's single fakes
all-gather.
"""

import re

import jax
import numpy as np

from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import Batches, make_train_step
from one_to_many_gan_tpu.parallel import make_mesh, replicate, shard_batch
from one_to_many_gan_tpu.presets import tiny_config


def _collective_counts(txt: str) -> dict[str, int]:
    return {
        op: len(re.findall(rf"= \S+ {op}", txt))
        for op in ("all-to-all", "all-gather", "collective-permute")
    }


def test_fused_step_hlo_has_no_batch_reshards_under_dp():
    mesh = make_mesh(8, 1)
    config = tiny_config(
        (32, 32),
        16,
        min_latent=8,
        tpu={"data_parallel": 8, "ada_pallas": False},
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    state = replicate(mesh, state)
    step = jax.jit(make_train_step(config, models, mesh))

    def mk():
        return shard_batch(
            mesh, np.random.rand(16, 32, 32, 1).astype(np.float32) * 2 - 1
        )

    batches = Batches(mk(), mk(), mk(), mk())
    txt = step.lower(state, batches, jax.random.key(1)).compile().as_text()
    counts = _collective_counts(txt)
    # Pre-fix tiny-config HLO: 110 collective-permutes + 17 all-to-alls,
    # every one from a concatenate/split/slice on the batch axis. The
    # production 256²/512² dp=8 programs compile to ZERO of either; at
    # toy shapes the partitioner emits a handful of sub-activation edge
    # permutes in conv pad-backwards (odd 31x31 spatial dims with 2
    # samples/chip) that vanish at production shapes — tolerate those,
    # pin the regression.
    assert counts["all-to-all"] == 0, counts
    assert counts["collective-permute"] <= 8, counts
    # buffer fakes gather (+ possible output reslice); everything else in
    # the step must be local
    assert counts["all-gather"] <= 3, counts
    # and specifically: no collective may originate from a batch-axis
    # concatenate/split/slice (the bug this file regresses)
    for line in txt.splitlines():
        if re.search(r"= \S+ (collective-permute|all-to-all)\(", line):
            assert not re.search(r"op_name=\"[^\"]*(split|concatenate)", line), line
