"""Fused train-step tests: finite losses, state evolution, jit, inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.state import Models, init_train_state, param_count
from one_to_many_gan_tpu.core.train_step import (
    Batches,
    make_inference_fns,
    make_train_step,
)
from tests.helpers import write_tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ts")
    config = load_config(write_tiny_config(tmp))
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    step = jax.jit(make_train_step(config, models))
    return config, models, state, step


def _batches(config, seed=0):
    rng = np.random.default_rng(seed)
    h, w = config["data"]["image_size"]
    c = config["data"]["image_channels"]
    b = config["training"]["batch_size"]

    def mk():
        return jnp.asarray(
            (rng.random((b, h, w, c)) * 2 - 1).astype(np.float32)
        )

    return Batches(mk(), mk(), mk(), mk())


def test_step_runs_and_metrics_finite(setup):
    config, models, state, step = setup
    new_state, metrics = step(state, _batches(config), jax.random.key(1))
    for name, value in metrics.items():
        assert np.isfinite(float(value)), f"{name} not finite"
    assert int(new_state.step) == 1
    assert int(new_state.ada.count) == 1


def test_all_four_networks_update(setup):
    config, models, state, step = setup
    new_state, _ = step(state, _batches(config), jax.random.key(1))

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b), strict=True)
        )

    assert changed(state.params_g, new_state.params_g)
    assert changed(state.params_d, new_state.params_d)
    assert changed(state.params_m, new_state.params_m)
    assert changed(state.params_s, new_state.params_s)


def test_multi_step_losses_stay_finite(setup):
    config, models, state, step = setup
    for i in range(4):
        state, metrics = step(state, _batches(config, seed=i), jax.random.key(i))
    assert int(state.step) == 4
    assert int(state.buffer.count) == 4  # buffer size 4 filled by 4 steps of b=2
    for name, value in metrics.items():
        assert np.isfinite(float(value)), f"{name} not finite after 4 steps"


def test_step_deterministic(setup):
    config, models, state, step = setup
    b = _batches(config)
    s1, m1 = step(state, b, jax.random.key(9))
    s2, m2 = step(state, b, jax.random.key(9))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))
    l1 = jax.tree.leaves(s1.params_g)
    l2 = jax.tree.leaves(s2.params_g)
    for a, b_ in zip(l1, l2, strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_param_counts_nontrivial(setup):
    _, models, state, _ = setup
    assert param_count(state.params_g) > 1_000_000
    assert param_count(state.params_d) > 1_000_000
    assert param_count(state.params_m) < 10_000  # tiny MLP (w_dim=6)


def test_inference_translate_and_one_to_many(setup):
    config, models, state, _ = setup
    translate, one_to_many, _ = make_inference_fns(config, models)
    h, w = config["data"]["image_size"]
    img = jax.random.normal(jax.random.key(7), (2, h, w, 1))
    out = translate(state.params_g, state.params_m, img, jax.random.key(0))
    assert out.shape == img.shape

    sweep = jax.jit(one_to_many, static_argnums=4)(
        state.params_g, state.params_m, img[0], jax.random.key(1), 8
    )
    assert sweep.shape == (8, h, w, 1)
    # different styles must give different outputs (one-to-MANY)
    diffs = [
        float(jnp.abs(sweep[i] - sweep[0]).mean()) for i in range(1, 8)
    ]
    assert max(diffs) > 1e-5


def test_many_to_many_matches_one_to_many_per_request(setup):
    """The cross-request serving batch: request i of many_to_many depends
    only on (images[i], keys[i], thetas[i], n) and equals the solo
    one_to_many path up to batched-execution float reassociation."""
    config, models, state, _ = setup
    _, one_to_many, many_to_many = make_inference_fns(config, models)
    h, w = config["data"]["image_size"]
    imgs = jax.random.normal(jax.random.key(5), (3, h, w, 1))
    seeds = np.asarray([3, 7, 11], np.uint32)
    thetas = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
    keys = jax.vmap(jax.random.key)(seeds)
    batched = jax.jit(many_to_many, static_argnums=4)(
        state.params_g, state.params_m, imgs, keys, 4, thetas
    )
    assert batched.shape == (3, 4, h, w, 1)
    for i in range(3):
        solo = one_to_many(
            state.params_g,
            state.params_m,
            imgs[i],
            jax.random.key(int(seeds[i])),
            4,
            float(thetas[i]),
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(solo), atol=1e-5
        )


def test_reconstruction_theta0_path(setup):
    """θ=0 decode must be style-free: zero w's give identical outputs for
    any style RNG (the reconstruction contract, builder.py:87-90)."""
    config, models, state, _ = setup
    translate, _, _ = make_inference_fns(config, models)
    h, w = config["data"]["image_size"]
    img = jax.random.normal(jax.random.key(3), (2, h, w, 1))
    r1 = translate(state.params_g, state.params_m, img, jax.random.key(10), domain=0.0)
    r2 = translate(state.params_g, state.params_m, img, jax.random.key(20), domain=0.0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_r1_lazy_regularization(tmp_path):
    """R1 fires only on steps where step % r1_interval == 0: the off-step D
    update must equal the r1_gamma=0 update exactly (the lax.cond branch is
    all-zeros), while the on-step update must differ."""
    cfg_r1 = load_config(
        write_tiny_config(
            tmp_path, tpu_section="\n[tpu]\nr1_gamma = 10.0\nr1_interval = 2\n"
        )
    )
    no_dir = tmp_path / "no"
    no_dir.mkdir()
    cfg_no = load_config(write_tiny_config(no_dir, tpu_section="\n[tpu]\n"))
    models = Models(cfg_r1)
    state = init_train_state(cfg_r1, models, jax.random.key(0))
    step_r1 = jax.jit(make_train_step(cfg_r1, models))
    step_no = jax.jit(make_train_step(cfg_no, models))
    b = _batches(cfg_r1)

    def d_leaves(s):
        return [np.asarray(x) for x in jax.tree.leaves(s.params_d)]

    # step 0: 0 % 2 == 0 -> R1 applied -> params diverge from the no-R1 run
    s_on, m_on = step_r1(state, b, jax.random.key(1))
    s_off, m_off = step_no(state, b, jax.random.key(1))
    assert any(
        not np.array_equal(a, c)
        for a, c in zip(d_leaves(s_on), d_leaves(s_off), strict=True)
    )
    assert float(m_on["disc_loss"]) > float(m_off["disc_loss"])

    # step 1: 1 % 2 != 0 -> R1 skipped -> identical D update to no-R1
    state1 = state.replace(step=jnp.ones((), jnp.int32))
    s_on, m_on = step_r1(state1, b, jax.random.key(1))
    s_off, m_off = step_no(state1, b, jax.random.key(1))
    for a, c in zip(d_leaves(s_on), d_leaves(s_off), strict=True):
        np.testing.assert_array_equal(a, c)
    assert float(m_on["disc_loss"]) == float(m_off["disc_loss"])


def test_ema_updates_when_enabled(tmp_path):
    config = load_config(
        write_tiny_config(tmp_path, tpu_section="\n[tpu]\nema_decay = 0.99\n")
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    assert state.ema_params_g is not None
    step = jax.jit(make_train_step(config, models))
    new_state, _ = step(state, _batches(config), jax.random.key(1))
    a = jax.tree.leaves(new_state.ema_params_g)[0]
    b = jax.tree.leaves(state.ema_params_g)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["conv", "full"])
def test_remat_modes_match_no_remat(tmp_path, mode):
    """Rematerialization must not change the math — only the schedule.

    "conv" saves only checkpoint_name-tagged conv outputs; "full"
    checkpoints whole model passes. Both recompute the same primal ops in
    the same order inside one jit, so updated params and metrics must
    match the no-remat step exactly (XLA recompute is deterministic).
    """
    (tmp_path / mode).mkdir()
    (tmp_path / "no").mkdir()
    cfg_r = load_config(
        write_tiny_config(tmp_path / mode, tpu_section=f'\n[tpu]\nremat = "{mode}"\n')
    )
    cfg_no = load_config(write_tiny_config(tmp_path / "no", tpu_section="\n[tpu]\n"))
    models = Models(cfg_r)
    state = init_train_state(cfg_r, models, jax.random.key(0))
    b = _batches(cfg_r)
    s_r, m_r = jax.jit(make_train_step(cfg_r, models))(state, b, jax.random.key(1))
    s_no, m_no = jax.jit(make_train_step(cfg_no, models))(state, b, jax.random.key(1))
    for name in m_no:
        np.testing.assert_allclose(
            np.asarray(m_r[name]), np.asarray(m_no[name]), rtol=2e-5, atol=1e-6,
            err_msg=name,
        )
    for a, c in zip(
        jax.tree.leaves(s_r.params_g), jax.tree.leaves(s_no.params_g), strict=True
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-5, atol=1e-6)


def test_remat_bool_compat(tmp_path):
    """Round-1 boolean remat values still load (False->none, True->full)."""
    cfg = load_config(
        write_tiny_config(tmp_path, tpu_section="\n[tpu]\nremat = true\n")
    )
    assert cfg["tpu"]["remat"] == "full"
    cfg2 = load_config(
        write_tiny_config(tmp_path, tpu_section="\n[tpu]\nremat = false\n")
    )
    assert cfg2["tpu"]["remat"] == "none"


def test_split_phases_bit_identical_to_fused(setup):
    """tpu.split_phases runs the same math as the fused program: both
    phases derive the same per-step RNG split (train_step.py), so the
    two-program execution must be BIT-identical to one fused step."""
    from one_to_many_gan_tpu.core.train_step import make_phase_fns

    config, models, state, step = setup
    batches = _batches(config, seed=13)
    rng = jax.random.key(11)
    s_fused, m_fused = jax.jit(step)(state, batches, rng)

    d_phase, g_phase = make_phase_fns(config, models)
    p_used = state.ada.p
    s1, dm = jax.jit(d_phase)(state, batches, rng)
    s2, gm = jax.jit(g_phase)(s1, batches, rng, p_used)
    merged = {**dm, **gm}
    for k in m_fused:
        np.testing.assert_array_equal(
            np.asarray(m_fused[k]), np.asarray(merged[k]), err_msg=k
        )
    for a, b in zip(
        jax.tree.leaves(s_fused), jax.tree.leaves(s2), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
