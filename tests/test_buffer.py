"""Replay-buffer semantics tests (reference ImageBuffer, training.py:22-65)."""

import jax
import jax.numpy as jnp
import numpy as np

from one_to_many_gan_tpu.core.buffer import buffer_apply, init_buffer


def _batch(seed, b=3, shape=(4, 4, 1)):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, *shape)).astype(np.float32)
    )


def test_fill_phase_passes_through_and_stores():
    state = init_buffer(8, (4, 4, 1))
    fakes = _batch(0)
    out, state = buffer_apply(state, fakes, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fakes))
    assert int(state.count) == 3
    np.testing.assert_array_equal(
        np.asarray(state.images[:3]), np.asarray(fakes)
    )


def test_fill_respects_capacity():
    state = init_buffer(4, (4, 4, 1))
    for seed in range(5):
        _, state = buffer_apply(state, _batch(seed), jax.random.key(seed))
    assert int(state.count) == 4


def test_partial_fill_then_swap_invariant():
    """Once full: every output is either the fresh fake or a stored image,
    and every stored image is either an old one or a fresh fake."""
    state = init_buffer(4, (2, 2, 1))
    first = _batch(1, b=4, shape=(2, 2, 1))
    _, state = buffer_apply(state, first, jax.random.key(1))
    stored_before = np.asarray(state.images).reshape(4, -1)

    second = _batch(2, b=4, shape=(2, 2, 1))
    out, state = buffer_apply(state, second, jax.random.key(2))
    out_np = np.asarray(out).reshape(4, -1)
    second_np = np.asarray(second).reshape(4, -1)
    stored_after = np.asarray(state.images).reshape(4, -1)

    pool = np.concatenate([stored_before, second_np])
    for row in out_np:
        assert any(np.allclose(row, c) for c in pool)
    for row in stored_after:
        assert any(np.allclose(row, c) for c in pool)


def test_swap_happens_with_reasonable_frequency():
    """~50% of post-fill images should come from the buffer."""
    state = init_buffer(2, (2, 2, 1))
    _, state = buffer_apply(state, _batch(0, b=2, shape=(2, 2, 1)), jax.random.key(0))
    swaps = 0
    total = 0
    for seed in range(40):
        fakes = _batch(100 + seed, b=2, shape=(2, 2, 1))
        out, state = buffer_apply(state, fakes, jax.random.key(seed))
        for i in range(2):
            total += 1
            if not np.allclose(np.asarray(out[i]), np.asarray(fakes[i])):
                swaps += 1
    assert 0.25 < swaps / total < 0.75


def test_buffer_apply_jits():
    state = init_buffer(4, (2, 2, 1))
    fn = jax.jit(buffer_apply)
    out, state = fn(state, _batch(0, b=2, shape=(2, 2, 1)), jax.random.key(0))
    assert out.shape == (2, 2, 2, 1)
