"""Multi-device tests on the virtual 8-device CPU mesh.

Verifies (a) the mesh/sharding layer, (b) that the FULL fused train step
compiles and executes under data (and data+spatial) parallelism, and
(c) that a sharded step computes the same metrics as a single-device step
(global-batch semantics preserved: KL stats, ADA sign means, etc.).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import Batches, make_train_step
from one_to_many_gan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from tests.helpers import write_tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("par")
    # batch 8 so it splits over 8, 4, and 2-way data meshes
    config = load_config(write_tiny_config(tmp, batch_size=8))
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    step = make_train_step(config, models)
    return config, models, state, step


def _batches(config, seed=0):
    rng = np.random.default_rng(seed)
    h, w = config["data"]["image_size"]
    b = config["training"]["batch_size"]

    def mk():
        return (rng.random((b, h, w, 1)) * 2 - 1).astype(np.float32)

    return Batches(mk(), mk(), mk(), mk())


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh(16, 1)


def test_dp_step_matches_single_device(setup):
    config, models, state, step = setup
    batches = _batches(config)
    rng = jax.random.key(5)

    # single device
    s1, m1 = jax.jit(step)(state, Batches(*map(jnp.asarray, batches)), rng)

    # 8-way data parallel (mesh-aware step: buffer all-gather-once etc.)
    mesh = make_mesh(8, 1)
    step8 = make_train_step(config, models, mesh)
    state_r = replicate(mesh, state)
    batches_r = Batches(*(shard_batch(mesh, b) for b in batches))
    s2, m2 = jax.jit(step8)(state_r, batches_r, rng)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k} diverged under DP",
        )
    # Parameters after the update must agree too. Tolerance: cross-replica
    # grad sums reassociate; for a near-zero gradient element Adam's first
    # step can flip sign, so differences are bounded by ~2*lr (4e-3), not
    # by a relative factor.
    lr = config["optimisation"]["learning_rate"]
    for a, b in zip(
        jax.tree.leaves(s1.params_g), jax.tree.leaves(s2.params_g), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5 * lr
        )


def test_dp_plus_spatial_step_matches_single_device(tmp_path):
    """The 4x2 data x spatial mesh must compute the SAME step as one
    device — height-sharded convs (halo exchanges), global-batch stats and
    the buffer all included. Equality, not finiteness (VERDICT r1 #5).

    Built from a spatial_parallel=2 config, exactly as Trainer would —
    which is what disables the head convs' space-to-depth formulation
    (it partitions incorrectly under H-sharding; ops/equalized.py)."""
    config = load_config(
        write_tiny_config(
            tmp_path, batch_size=8, tpu_section="\n[tpu]\nspatial_parallel = 2\n"
        )
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    step = make_train_step(config, models)
    batches = _batches(config, seed=1)
    rng = jax.random.key(6)

    s1, m1 = jax.jit(step)(state, Batches(*map(jnp.asarray, batches)), rng)

    mesh = make_mesh(4, 2)
    step_mesh = make_train_step(config, models, mesh)
    state_r = replicate(mesh, state)
    batches_r = Batches(*(shard_batch(mesh, b) for b in batches))
    s2, m2 = jax.jit(step_mesh)(state_r, batches_r, rng)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k} diverged under dp+spatial",
        )
    # Updated params must agree (same tolerance rationale as the DP test).
    lr = config["optimisation"]["learning_rate"]
    for name in ("params_g", "params_d", "params_m", "params_s"):
        for a, b in zip(
            jax.tree.leaves(getattr(s1, name)),
            jax.tree.leaves(getattr(s2, name)),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5 * lr,
                err_msg=f"{name} diverged under dp+spatial",
            )
    assert int(s2.step) == 1


def test_batch_sharding_layout(setup):
    config, _, _, _ = setup
    mesh = make_mesh(8, 1)
    x = shard_batch(mesh, _batches(config).d_shoeprints)
    assert x.sharding == batch_sharding(mesh)
    # per-device shard carries B/8 images
    assert x.addressable_shards[0].data.shape[0] == x.shape[0] // 8


def test_spatial_config_disables_head_s2d(tmp_path):
    """Models built from a spatial_parallel>1 config must turn off the
    generator head conv's space-to-depth (it partitions incorrectly under
    XLA SPMD H-sharding — this is the regression guard for that
    silent-wrongness). The discriminator head never uses s2d (its 4x4
    pad-1 conv output is odd-sized; models/discriminator.py)."""
    cfg_sp = load_config(
        write_tiny_config(
            tmp_path, batch_size=8, tpu_section="\n[tpu]\nspatial_parallel = 2\n"
        )
    )
    assert Models(cfg_sp).generator.head_s2d == 0


def test_split_phases_dp_spatial_matches_single_device(tmp_path):
    """tpu.split_phases under the 4x2 data x spatial mesh: the two-program
    execution must compute the SAME step as the single-device fused
    program (the 512² flagship operating point is split-phase; BASELINE.md
    round-3 results). Covers the mesh-aware buffer all-gather and the
    per-phase augment path under sharding."""
    from one_to_many_gan_tpu.core.train_step import make_phase_fns

    config = load_config(
        write_tiny_config(
            tmp_path, batch_size=8, tpu_section="\n[tpu]\nspatial_parallel = 2\n"
        )
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    batches = _batches(config, seed=3)
    rng = jax.random.key(8)

    step1 = make_train_step(config, models)
    s1, m1 = jax.jit(step1)(state, Batches(*map(jnp.asarray, batches)), rng)

    mesh = make_mesh(4, 2)
    d_phase, g_phase = make_phase_fns(config, models, mesh)
    state_r = replicate(mesh, state)
    batches_r = Batches(*(shard_batch(mesh, b) for b in batches))
    p_used = state_r.ada.p
    s_d, dm = jax.jit(d_phase)(state_r, batches_r, rng)
    s2, gm = jax.jit(g_phase)(s_d, batches_r, rng, p_used)
    m2 = {**dm, **gm}

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k} diverged under split-phase dp+spatial",
        )
    lr = config["optimisation"]["learning_rate"]
    for name in ("params_g", "params_d", "params_m", "params_s"):
        for a, b in zip(
            jax.tree.leaves(getattr(s1, name)),
            jax.tree.leaves(getattr(s2, name)),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5 * lr,
                err_msg=f"{name} diverged under split-phase dp+spatial",
            )
    assert int(s2.step) == 1


def test_deep_spatial_split_matches_single_device(tmp_path):
    """2x4 data x spatial mesh — a FOUR-way height split (8 rows per
    device at 32², 4 latent rows after downsampling). Deeper spatial
    splits chain more halo exchanges through the conv/resampling ladders
    than the 4x2 case; the step must still equal one device exactly."""
    config = load_config(
        write_tiny_config(
            tmp_path, batch_size=8, tpu_section="\n[tpu]\nspatial_parallel = 4\n"
        )
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    batches = _batches(config, seed=4)
    rng = jax.random.key(9)

    s1, m1 = jax.jit(make_train_step(config, models))(
        state, Batches(*map(jnp.asarray, batches)), rng
    )

    mesh = make_mesh(2, 4)
    step_mesh = make_train_step(config, models, mesh)
    state_r = replicate(mesh, state)
    batches_r = Batches(*(shard_batch(mesh, b) for b in batches))
    s2, m2 = jax.jit(step_mesh)(state_r, batches_r, rng)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k} diverged under 2x4 dp+spatial",
        )
    lr = config["optimisation"]["learning_rate"]
    for name in ("params_g", "params_d"):
        for a, b in zip(
            jax.tree.leaves(getattr(s1, name)),
            jax.tree.leaves(getattr(s2, name)),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5 * lr,
                err_msg=f"{name} diverged under 2x4 dp+spatial",
            )


def test_dp_step_with_pallas_warp_matches_single_device(tmp_path):
    """ada_pallas under pure data parallelism: the kernel runs shard_map'd
    over the batch axis (a pallas_call has no SPMD partitioning rule —
    without the wrap XLA would all-gather and replicate it, ADVICE r2).
    Must compute the SAME step as one device with the kernel active."""
    config = load_config(
        write_tiny_config(
            tmp_path, batch_size=8, tpu_section="\n[tpu]\nada_pallas = true\n"
        )
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    batches = _batches(config, seed=2)
    rng = jax.random.key(7)

    step1 = make_train_step(config, models)  # no mesh: plain pallas call
    s1, m1 = jax.jit(step1)(state, Batches(*map(jnp.asarray, batches)), rng)

    mesh = make_mesh(8, 1)
    step8 = make_train_step(config, models, mesh)
    state_r = replicate(mesh, state)
    batches_r = Batches(*(shard_batch(mesh, b) for b in batches))
    s2, m2 = jax.jit(step8)(state_r, batches_r, rng)

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"metric {k} diverged under DP with ada_pallas",
        )
    lr = config["optimisation"]["learning_rate"]
    for a, b in zip(
        jax.tree.leaves(s1.params_d), jax.tree.leaves(s2.params_d), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2.5 * lr
        )
