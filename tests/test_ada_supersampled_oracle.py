"""Bounded error of the adaptive-tent ADA warp against the PUBLISHED
2x supersampled, sym6-filtered warp (VERDICT r2 #7).

The reference's discriminator trains under pytorch-ada's geometric
pipeline (reference train.py:175-188), whose antialiasing contract is the
published 2x supersampled wavelet-filtered warp. Our production path
(augment/pipeline.py, antialias=True) approximates it with an adaptively
widened separable tent; tests/supersampled_oracle.py implements the
published family as a slow numpy oracle. These tests bound the
approximation error over transforms drawn from the ACTUAL ADA parameter
distribution (geometric_matrix) at several p values — not just a
checkerboard — and in the forced strong-minification regime.

Measured context for the bounds (32^2 smooth/sharp content in [-1,1]):
the irreducible floor is the interpolation-kernel difference (sym6-
filtered bilinear at 2x vs plain tent), ~0.01-0.03 mean abs; the L2
width rule sits near that floor, while the round-2 L1 rule exceeded it
~30-70% (over-filtered rotations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from one_to_many_gan_tpu.augment.pipeline import (
    ALL_CATEGORIES,
    geometric_matrix,
    warp_bilinear,
)
from tests.supersampled_oracle import supersampled_warp

GEOM = frozenset(
    c
    for c in ALL_CATEGORIES
    if c in ("xflip", "rotate90", "xint", "scale", "rotate", "aniso", "xfrac")
)


def _smooth_images(b, h, w, sigma, seed):
    r = np.random.default_rng(seed)
    x = np.stack(
        [gaussian_filter(r.standard_normal((h, w)), sigma) for _ in range(b)]
    ).astype(np.float32)[..., None]
    return x / np.abs(x).max()


@pytest.mark.parametrize("p", [0.2, 0.5, 0.9])
def test_bounded_error_over_ada_distribution(p):
    """Transforms drawn from the real ADA parameter distribution at
    probability p: mean abs deviation from the published supersampled
    warp stays within the measured bound."""
    b, h, w = 16, 32, 32
    x = _smooth_images(b, h, w, sigma=1.2, seed=1)
    g = np.asarray(
        geometric_matrix(jax.random.key(int(p * 100)), b, h, w, jnp.float32(p), GEOM)
    )
    ours = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g), antialias=True))
    oracle = supersampled_warp(x.astype(np.float64), g.astype(np.float64))
    interior = np.s_[:, 6:-6, 6:-6, :]
    err = np.abs(ours[interior] - oracle[interior])
    assert err.mean() < 0.03, err.mean()
    # per-image means: no single transform may blow up
    per_img = err.mean(axis=(1, 2, 3))
    assert per_img.max() < 0.08, per_img.max()


def test_bounded_error_strong_minification_sharp_content():
    """Forced minification x rotation on near-Nyquist content — the regime
    antialiasing exists for. The tent path must stay within the bound AND
    beat plain bilinear against the published reference."""
    b, h, w = 8, 32, 32
    x = _smooth_images(b, h, w, sigma=0.6, seed=2)

    def rot_scale(s, th):
        c, si = np.cos(th), np.sin(th)
        return np.array(
            [[s * c, -s * si, 0], [s * si, s * c, 0], [0, 0, 1]], np.float64
        )

    g = np.stack(
        [rot_scale(2.5, t) for t in np.linspace(0, np.pi / 3, b)]
    )
    ours = np.asarray(
        warp_bilinear(jnp.asarray(x), jnp.asarray(g.astype(np.float32)), antialias=True)
    )
    plain = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g.astype(np.float32))))
    oracle = supersampled_warp(x.astype(np.float64), g)
    interior = np.s_[:, 7:-7, 7:-7, :]
    err_aa = np.abs(ours[interior] - oracle[interior]).mean()
    err_plain = np.abs(plain[interior] - oracle[interior]).mean()
    assert err_aa < 0.06, err_aa
    assert err_aa < err_plain, (err_aa, err_plain)


def test_rigid_transforms_not_blurred():
    """Pure rotations/flips have unit sampling density: the published
    pipeline leaves them sharp, and the L2 width rule must reduce the
    tent path to EXACT plain bilinear (the round-2 L1 rule blurred them
    with widths up to sqrt(2))."""
    b, h, w = 6, 24, 24
    x = _smooth_images(b, h, w, sigma=0.6, seed=3)
    ths = np.linspace(0.1, np.pi / 2 - 0.1, b)
    g = np.stack(
        [
            np.array(
                [
                    [np.cos(t), -np.sin(t), 0.7],
                    [np.sin(t), np.cos(t), -1.3],
                    [0, 0, 1],
                ],
                np.float32,
            )
            for t in ths
        ]
    )
    aa = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g), antialias=True))
    plain = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g)))
    np.testing.assert_allclose(aa, plain, rtol=1e-5, atol=1e-6)
