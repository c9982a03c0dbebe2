"""ADA geometric-warp parity tests against torch oracles.

The reference trains under the pytorch-ada geometric pipeline
(reference train.py:175-188). These tests verify our TPU-native warp
against independent torch oracles written from the math:

- plain bilinear path == ``F.affine_grid`` + ``F.grid_sample``
  (bilinear, zeros padding, align_corners=False) EXACTLY, for random
  affines and for each non-integer ADA category's composed transform;
- antialiased path == a torch oracle of the adaptive-width normalized
  tent kernel spec (see augment/pipeline.py warp_bilinear docstring);
- under minification the antialiased path is much closer to a heavily
  supersampled ground truth than plain bilinear (the property the
  published pipeline's 2x supersampled warp exists to provide).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from one_to_many_gan_tpu.augment.pipeline import (
    _AA_MAX_WIDTH,
    geometric_matrix,
    warp_bilinear,
)

rng_np = np.random.default_rng(99)


def torch_warp(images_nhwc: np.ndarray, g_inv: np.ndarray) -> np.ndarray:
    """Oracle: bilinear zero-padded affine warp via torch grid_sample.

    Our convention: g_inv maps CENTERED output pixel coords to centered
    input coords. torch align_corners=False normalized coords relate to
    centered pixel coords by n = 2 * c / size, so
    theta = diag(2/W_in, 2/H_in) @ g_inv @ diag(W_out/2, H_out/2, 1).
    """
    x = torch.from_numpy(images_nhwc).double().permute(0, 3, 1, 2)  # NCHW
    b, c, h, w = x.shape
    g = torch.from_numpy(np.asarray(g_inv)).double()
    s_out = torch.diag(torch.tensor([w / 2.0, h / 2.0, 1.0])).double()
    s_in = torch.diag(torch.tensor([2.0 / w, 2.0 / h, 1.0])).double()
    theta = (s_in @ g @ s_out)[:, :2, :]
    grid = F.affine_grid(theta, size=(b, c, h, w), align_corners=False)
    y = F.grid_sample(
        x, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    return y.permute(0, 2, 3, 1).numpy()


def torch_warp_antialiased(images_nhwc: np.ndarray, g_inv: np.ndarray) -> np.ndarray:
    """Oracle for the adaptive-width kernel spec, written independently:
    per-axis width = clip(L2 row norm of the Jacobian, 1, MAX), kernel
    tent(d/w), normalized by its full-grid sum, out-of-frame taps read 0.
    """
    imgs = images_nhwc.astype(np.float64)
    b, h, w, c = imgs.shape
    out = np.zeros_like(imgs)
    for i in range(b):
        g = np.asarray(g_inv[i], dtype=np.float64)
        wx = float(np.clip(np.hypot(g[0, 0], g[0, 1]), 1.0, _AA_MAX_WIDTH))
        wy = float(np.clip(np.hypot(g[1, 0], g[1, 1]), 1.0, _AA_MAX_WIDTH))
        for oy in range(h):
            for ox in range(w):
                cx, cy = ox - (w - 1) / 2.0, oy - (h - 1) / 2.0
                sx = g[0, 0] * cx + g[0, 1] * cy + g[0, 2] + (w - 1) / 2.0
                sy = g[1, 0] * cx + g[1, 1] * cy + g[1, 2] + (h - 1) / 2.0
                # x taps over the full integer grid for normalization
                kx_lo, kx_hi = int(np.floor(sx - wx)), int(np.ceil(sx + wx))
                ky_lo, ky_hi = int(np.floor(sy - wy)), int(np.ceil(sy + wy))
                acc = np.zeros(c)
                norm_x = norm_y = 0.0
                vals_x = {}
                for kx in range(kx_lo, kx_hi + 1):
                    t = max(0.0, 1.0 - abs((sx - kx) / wx))
                    norm_x += t
                    if t and 0 <= kx < w:
                        vals_x[kx] = t
                for ky in range(ky_lo, ky_hi + 1):
                    t = max(0.0, 1.0 - abs((sy - ky) / wy))
                    norm_y += t
                    if t and 0 <= ky < h:
                        for kx, tx in vals_x.items():
                            acc += t * tx * imgs[i, ky, kx]
                out[i, oy, ox] = acc / (norm_x * norm_y)
    return out


def _rand_affines(b: int, scale_lo=0.6, scale_hi=1.6) -> np.ndarray:
    """Random invertible centered affines [b,3,3] (rot x scale x shear x t)."""
    gs = []
    for _ in range(b):
        th = rng_np.uniform(-np.pi, np.pi)
        s = rng_np.uniform(scale_lo, scale_hi, size=2)
        sh = rng_np.uniform(-0.3, 0.3)
        t = rng_np.uniform(-3, 3, size=2)
        rot = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        sc = np.diag([s[0], s[1], 1.0])
        shm = np.array([[1, sh, 0], [0, 1, 0], [0, 0, 1]])
        tr = np.eye(3)
        tr[:2, 2] = t
        gs.append(rot @ sc @ shm @ tr)
    return np.stack(gs).astype(np.float32)


def _images(b=4, h=17, w=13, c=1):
    return rng_np.standard_normal((b, h, w, c)).astype(np.float32)


# ------------------------------------------------- plain bilinear exactness


def test_warp_matches_torch_grid_sample_random_affines():
    x = _images(b=6, h=17, w=13)
    g = _rand_affines(6)
    ours = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g)))
    oracle = torch_warp(x, g)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_warp_matches_torch_nonsquare_rgb():
    x = _images(b=3, h=24, w=10, c=3)
    g = _rand_affines(3)
    ours = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g)))
    oracle = torch_warp(x, g)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("category", ["scale", "rotate", "aniso", "xfrac"])
def test_noninteger_category_matches_torch(category):
    """Each non-integer geometric category, composed by geometric_matrix at
    p=1, warps exactly like the torch oracle with the same matrices."""
    x = _images(b=8, h=16, w=16)
    g = np.asarray(
        geometric_matrix(
            jax.random.key(3), 8, 16, 16, jnp.float32(1.0), frozenset({category})
        )
    )
    ours = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g)))
    oracle = torch_warp(x, g)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)
    # the category actually transformed something
    assert not np.allclose(ours, x, atol=1e-5)


# ------------------------------------------------- antialiased path


def test_antialiased_identity_and_translation_exact():
    """Width-1 transforms (|J| row sums == 1): the antialiased path must
    reduce exactly to plain bilinear."""
    x = _images(b=2, h=12, w=11)
    g = np.stack([np.eye(3, dtype=np.float32)] * 2)
    g[1, 0, 2], g[1, 1, 2] = 1.7, -2.3  # fractional translation
    plain = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g)))
    aa = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g), antialias=True))
    np.testing.assert_allclose(aa, plain, rtol=1e-5, atol=1e-6)


def test_antialiased_matches_oracle():
    x = _images(b=4, h=14, w=12)
    # include strong minification (g_inv entries > 1) to exercise widths
    g = _rand_affines(4, scale_lo=0.8, scale_hi=3.0)
    ours = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g), antialias=True))
    oracle = torch_warp_antialiased(x, g)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_antialias_suppresses_minification_aliasing():
    """Downscaling a Nyquist checkerboard 3x: plain bilinear aliases (big
    residual checker energy); the antialiased warp must average it out and
    land much closer to the 9x-supersampled ground truth."""
    h = w = 36
    checker = ((np.indices((h, w)).sum(axis=0) % 2) * 2.0 - 1.0).astype(np.float32)
    x = checker[None, :, :, None]
    g = np.diag([3.0, 3.0, 1.0]).astype(np.float32)[None]  # output->input: 3x shrink

    # ground truth: average the minified content with a dense 9x9 sample
    # grid per output pixel (box supersampling of the source signal)
    xt = torch.from_numpy(x).double().permute(0, 3, 1, 2)
    ss = 9
    hs, ws = h * ss, w * ss
    theta = torch.tensor([[[3.0 * 2 / w * (w / 2), 0, 0], [0, 3.0 * 2 / h * (h / 2), 0]]])
    # build the supersampled output grid manually: centered coords
    oy = (np.arange(hs) + 0.5) / ss - 0.5 - (h - 1) / 2.0
    ox = (np.arange(ws) + 0.5) / ss - 0.5 - (w - 1) / 2.0
    gy, gx = np.meshgrid(oy, ox, indexing="ij")
    sx = 3.0 * gx + (w - 1) / 2.0
    sy = 3.0 * gy + (h - 1) / 2.0
    grid = torch.from_numpy(
        np.stack([2 * (sx - (w - 1) / 2) / w, 2 * (sy - (h - 1) / 2) / h], axis=-1)
    ).double()[None]
    fine = F.grid_sample(
        xt, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    truth = (
        fine.reshape(1, 1, h, ss, w, ss).mean(dim=(3, 5)).permute(0, 2, 3, 1).numpy()
    )

    plain = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g)))
    aa = np.asarray(warp_bilinear(jnp.asarray(x), jnp.asarray(g), antialias=True))
    interior = np.s_[:, 6:-6, 6:-6, :]
    err_plain = np.abs(plain[interior] - truth[interior]).mean()
    err_aa = np.abs(aa[interior] - truth[interior]).mean()
    assert err_aa < 0.35 * err_plain, (err_plain, err_aa)


def test_integer_categories_still_exact_under_antialias():
    """xflip/rotate90/xint have width-1 Jacobians: antialias must keep them
    pixel-exact (the published pipeline's integer fast path)."""
    from one_to_many_gan_tpu.augment import augment

    x = jnp.asarray(_images(b=32, h=16, w=16))
    y = augment(x, 1.0, jax.random.key(5), categories=("xflip",), antialias=True)
    xn, yn = np.asarray(x), np.asarray(y)
    flipped = np.flip(xn, axis=2)
    for i in range(32):
        assert np.allclose(yn[i], flipped[i], atol=1e-5) or np.allclose(
            yn[i], xn[i], atol=1e-5
        )


def test_antialiased_warp_differentiable():
    x = jnp.asarray(_images(b=2, h=8, w=8))
    g = jnp.asarray(_rand_affines(2, scale_lo=1.2, scale_hi=2.0))

    def f(img):
        return jnp.sum(warp_bilinear(img, g, antialias=True))

    grads = jax.grad(f)(x)
    assert np.isfinite(np.asarray(grads)).all()
    assert np.abs(np.asarray(grads)).sum() > 0
