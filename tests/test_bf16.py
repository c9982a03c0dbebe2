"""bfloat16 mixed-precision policy tests (tpu.precision = "bfloat16").

Params stay float32; conv/matmul activations run bf16; normalization
statistics, style math, demodulation, and losses stay float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import Batches, make_train_step
from tests.helpers import write_tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bf16")
    config = load_config(
        write_tiny_config(tmp, tpu_section='\n[tpu]\nprecision = "bfloat16"\n')
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    step = jax.jit(make_train_step(config, models))
    return config, models, state, step


def _batches(config, seed=0):
    rng = np.random.default_rng(seed)
    h, w = config["data"]["image_size"]
    b = config["training"]["batch_size"]

    def mk():
        return jnp.asarray((rng.random((b, h, w, 1)) * 2 - 1).astype(np.float32))

    return Batches(mk(), mk(), mk(), mk())


def test_params_stay_f32(setup):
    _, _, state, _ = setup
    for leaf in jax.tree.leaves(state.params_g):
        assert leaf.dtype == jnp.float32


def test_bf16_steps_finite(setup):
    config, _, state, step = setup
    for i in range(3):
        state, metrics = step(state, _batches(config, i), jax.random.key(i))
    for name, value in metrics.items():
        assert np.isfinite(float(value)), f"{name} not finite under bf16"


def test_bf16_forward_close_to_f32(setup, tmp_path):
    """One generator forward under bf16 stays within bf16 tolerance of f32."""
    config, models_bf, state, _ = setup
    config_f32 = dict(config)
    config_f32["tpu"] = {**config["tpu"], "precision": "float32"}
    models_f32 = Models(config_f32)

    h, w = config["data"]["image_size"]
    x = jax.random.normal(jax.random.key(1), (2, h, w, 1), jnp.float32)
    wv = jax.random.normal(
        jax.random.key(2), (models_bf.n_style_blocks, 2, 6), jnp.float32
    )
    out_bf = models_bf.generator.apply(state.params_g, x, wv)
    out_f32 = models_f32.generator.apply(state.params_g, x, wv)
    assert out_bf.dtype == jnp.bfloat16
    # tanh output in [-1,1]: bf16 conv accumulation error stays small
    diff = np.abs(np.asarray(out_bf, np.float32) - np.asarray(out_f32))
    assert diff.mean() < 0.05


def test_bf16_augment_close_to_f32():
    """The ADA pipeline under bf16 inputs tracks the f32 path within bf16
    tolerance (tent weights/accumulation stay f32 internally)."""
    from one_to_many_gan_tpu.augment import augment

    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.random((4, 32, 32, 1)) * 2 - 1).astype(np.float32))
    key = jax.random.key(5)
    y32 = augment(x, 0.7, key)
    y16 = augment(x.astype(jnp.bfloat16), 0.7, key)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), atol=0.04
    )
