"""Tests for the ADA augmentation pipeline and probability controller."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.augment import (
    augment,
    init_ada_state,
    make_ada_update,
)
from one_to_many_gan_tpu.augment.pipeline import apply_color, warp_bilinear

rng_np = np.random.default_rng(11)


def _images(b=4, h=16, w=12, c=1):
    return jnp.asarray(rng_np.standard_normal((b, h, w, c)).astype(np.float32))


# ---------------------------------------------------------------- pipeline


def test_p_zero_is_identity():
    x = _images()
    y = augment(x, 0.0, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_p_zero_is_identity_pallas():
    x = _images()
    y = augment(x, 0.0, jax.random.key(0), pallas=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_deterministic_given_key():
    x = _images()
    y1 = augment(x, 0.7, jax.random.key(3))
    y2 = augment(x, 0.7, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = augment(x, 0.7, jax.random.key(4))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_xflip_only_produces_exact_flips():
    x = _images(b=64)
    y = augment(x, 1.0, jax.random.key(5), categories=("xflip",))
    xn, yn = np.asarray(x), np.asarray(y)
    flipped = np.flip(xn, axis=2)
    n_flipped = n_same = 0
    for i in range(64):
        if np.allclose(yn[i], flipped[i], atol=1e-5):
            n_flipped += 1
        elif np.allclose(yn[i], xn[i], atol=1e-5):
            n_same += 1
    # Every sample must be exactly original or exactly mirrored, ~50/50.
    assert n_flipped + n_same == 64
    assert 10 < n_flipped < 54


def test_rotate90_square_images_exact():
    x = _images(b=64, h=16, w=16)
    y = augment(x, 1.0, jax.random.key(6), categories=("rotate90",))
    xn, yn = np.asarray(x), np.asarray(y)
    matched = 0
    for i in range(64):
        # must match one of the four exact quarter-turns
        cands = [np.rot90(xn[i], k, axes=(0, 1)) for k in range(4)]
        if any(np.allclose(yn[i], c, atol=1e-4) for c in cands):
            matched += 1
    assert matched == 64


def test_xint_translation_preserves_content():
    """Integer translation: values are moved, not interpolated."""
    x = _images(b=32, h=16, w=16)
    y = augment(x, 1.0, jax.random.key(7), categories=("xint",))
    xn, yn = np.asarray(x), np.asarray(y)
    for i in range(32):
        inter = np.intersect1d(np.round(xn[i], 5), np.round(yn[i], 5))
        assert inter.size > 0.4 * xn[i].size  # most pixels survive the shift


def test_brightness_shifts_mean_grayscale():
    x = _images(b=256)
    y = augment(x, 1.0, jax.random.key(8), categories=("brightness",))
    per_sample_shift = np.asarray(y - x).mean(axis=(1, 2, 3))
    # shift is constant per sample
    np.testing.assert_allclose(
        np.asarray(y - x).std(axis=(1, 2, 3)), 0.0, atol=1e-5
    )
    assert per_sample_shift.std() > 0.05  # std 0.2 gaussian shifts


def test_contrast_scales_grayscale():
    x = _images(b=8)
    y = augment(x, 1.0, jax.random.key(9), categories=("contrast",))
    ratio = np.asarray(y) / np.asarray(x)
    np.testing.assert_allclose(ratio.std(axis=(1, 2, 3)), 0.0, atol=1e-4)


def test_hue_saturation_noop_on_grayscale():
    x = _images(b=8, c=1)
    y = augment(x, 1.0, jax.random.key(10), categories=("hue", "saturation"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_hue_preserves_luma_rgb():
    x = _images(b=8, c=3)
    y = augment(x, 1.0, jax.random.key(11), categories=("hue",))
    luma_x = np.asarray(x).sum(axis=-1)
    luma_y = np.asarray(y).sum(axis=-1)
    np.testing.assert_allclose(luma_x, luma_y, rtol=1e-3, atol=1e-4)


def test_lumaflip_is_involution():
    """Applying the luma householder reflection twice = identity."""
    from one_to_many_gan_tpu.augment.pipeline import _LUMA, _eye4

    v = np.asarray(_LUMA)
    m = np.eye(4) - 2 * np.outer(v, v)
    np.testing.assert_allclose(m @ m, np.eye(4), atol=1e-6)


def test_warp_identity():
    x = _images(b=2, h=9, w=7)
    g = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    y = warp_bilinear(x, g)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_augment_differentiable():
    """The generator needs gradients through the augmentation."""
    x = _images(b=2, h=8, w=8)

    def f(img):
        return jnp.sum(augment(img, 0.9, jax.random.key(12)))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_apply_color_rgb_matrix():
    x = _images(b=2, c=3)
    cmat = jnp.broadcast_to(jnp.eye(4) * 2.0, (2, 4, 4)).at[:, 3, 3].set(1.0)
    y = apply_color(x, cmat)
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.asarray(x), rtol=1e-6)


# ---------------------------------------------------------------- controller


class _OracleADAp:
    """Literal re-statement of the reference controller semantics
    (loss.py:11-52) in plain Python, as the test oracle."""

    def __init__(self, ada_e, adjustment_size, batch_size, target):
        self.n_batches = ada_e // batch_size
        self.adjustment = adjustment_size * ada_e
        self.target = target
        self.p = 0.0
        self.curr_batch = 0
        self.scores = []

    def update(self, score):
        if self.curr_batch == self.n_batches:
            self.scores.append(score)
            mean = float(np.mean(self.scores))
            if mean < self.target:
                self.p -= self.adjustment
            elif mean > self.target:
                self.p += self.adjustment
            self.curr_batch = 0
            self.scores = []
            self.p = max(self.p, 0.0)
        self.curr_batch += 1
        self.scores.append(score)


@pytest.mark.parametrize("seed", [0, 1])
def test_controller_matches_oracle(seed):
    ada_e, adj, bs, target = 32, 5.12e-4, 4, 0.6
    update = make_ada_update(ada_e, adj, bs, target)
    state = init_ada_state()
    oracle = _OracleADAp(ada_e, adj, bs, target)

    scores = np.random.default_rng(seed).uniform(-1, 1, size=200).astype(np.float32)
    ps = []
    for s in scores:
        state = update(state, jnp.asarray(s))
        oracle.update(float(s))
        ps.append((float(state.p), oracle.p))
    for got, want in ps:
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_controller_p_rises_on_overfit():
    update = make_ada_update(8, 1e-3, 4, 0.6)
    state = init_ada_state()
    for _ in range(50):
        state = update(state, jnp.asarray(1.0))  # D always confident on reals
    assert float(state.p) > 0.0


def test_controller_p_clamped_at_zero():
    update = make_ada_update(8, 1e-3, 4, 0.6)
    state = init_ada_state()
    for _ in range(50):
        state = update(state, jnp.asarray(-1.0))
    assert float(state.p) == 0.0
