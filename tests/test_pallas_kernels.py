"""Pallas kernel correctness tests (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.ops import instance_norm
from one_to_many_gan_tpu.ops.pallas import (
    instance_norm_pallas,
    instance_norm_relu_pallas,
)

rng = np.random.default_rng(5)


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 16, 8, 8), (3, 8, 8, 6)])
def test_instance_norm_pallas_matches_reference(shape):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 2 + 0.5)
    got = instance_norm_pallas(x, interpret=True)
    want = instance_norm(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_instance_norm_relu_pallas(
):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    got = instance_norm_relu_pallas(x, interpret=True)
    want = jnp.maximum(instance_norm(x), 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_instance_norm_pallas_bf16():
    x = jnp.asarray(
        rng.standard_normal((2, 8, 8, 4)).astype(np.float32), dtype=jnp.bfloat16
    )
    got = instance_norm_pallas(x, interpret=True)
    want = instance_norm(x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05
    )
    assert got.dtype == jnp.bfloat16


# ---------------------------------------------------------------- ADA warp

GEOM_CATS = frozenset(
    {"xflip", "rotate90", "xint", "scale", "rotate", "aniso", "xfrac"}
)


@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize("shape", [(3, 32, 32), (2, 16, 24)])
def test_warp_pallas_matches_xla_path(antialias, shape):
    """The fused VMEM warp kernel equals the XLA tent-contraction path
    (fwd and image-cotangent bwd) on random affine transforms."""
    import jax

    from one_to_many_gan_tpu.augment.pipeline import (
        geometric_matrix,
        warp_bilinear,
    )

    b, h, w = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, 1)).astype(np.float32))
    g = geometric_matrix(jax.random.key(11), b, h, w, jnp.float32(0.9), GEOM_CATS)
    y_ref = warp_bilinear(x, g, antialias=antialias)
    y_pal = warp_bilinear(x, g, antialias=antialias, pallas=True)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), atol=2e-6
    )
    g_ref = jax.grad(
        lambda z: jnp.sum(jnp.sin(warp_bilinear(z, g, antialias=antialias)))
    )(x)
    g_pal = jax.grad(
        lambda z: jnp.sum(
            jnp.sin(warp_bilinear(z, g, antialias=antialias, pallas=True))
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=2e-6
    )


def test_warp_pallas_bf16_and_full_augment():
    """bf16 pallas warp tracks the f32 XLA path within bf16 tolerance, and
    the full augment() pipeline accepts the pallas flag."""
    import jax

    from one_to_many_gan_tpu.augment import augment

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)).astype(np.float32))
    key = jax.random.key(3)
    y_ref = augment(x, 0.7, key)
    y_pal = augment(x.astype(jnp.bfloat16), 0.7, key, pallas=True)
    assert y_pal.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_pal, np.float32), np.asarray(y_ref), atol=0.05
    )


def test_warp_pallas_train_step_equivalence(tmp_path):
    """A full train step with tpu.ada_pallas=true matches the XLA-warp
    step: params and metrics (CPU interpret mode)."""
    import jax

    from one_to_many_gan_tpu.core.state import Models, init_train_state
    from one_to_many_gan_tpu.core.train_step import Batches, make_train_step
    from tests.helpers import write_tiny_config
    from one_to_many_gan_tpu.config import load_config

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    cfg_p = load_config(
        write_tiny_config(tmp_path / "a", tpu_section="\n[tpu]\nada_pallas = true\n")
    )
    cfg_x = load_config(write_tiny_config(tmp_path / "b", tpu_section="\n[tpu]\n"))
    models = Models(cfg_p)
    state = init_train_state(cfg_p, models, jax.random.key(0))
    size = cfg_p["data"]["image_size"]
    batch = cfg_p["training"]["batch_size"]
    r = np.random.default_rng(0)

    def mk():
        return jnp.asarray(
            (r.random((batch, *size, 1)) * 2 - 1).astype(np.float32)
        )

    b = Batches(mk(), mk(), mk(), mk())
    s_p, m_p = jax.jit(make_train_step(cfg_p, models))(state, b, jax.random.key(1))
    s_x, m_x = jax.jit(make_train_step(cfg_x, models))(state, b, jax.random.key(1))
    for name in m_x:
        np.testing.assert_allclose(
            np.asarray(m_p[name]), np.asarray(m_x[name]), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )
    for a, c in zip(
        jax.tree.leaves(s_p.params_g), jax.tree.leaves(s_x.params_g), strict=True
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-5
        )
