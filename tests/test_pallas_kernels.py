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
