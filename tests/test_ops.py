"""Unit tests for primitive ops against independent torch oracles.

Each oracle is written from the mathematical contract (see SURVEY.md §2
items 5-7), not imported from anywhere: torch serves as a trusted
implementation of conv/interpolate semantics to verify our JAX ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from one_to_many_gan_tpu.ops import (
    EqualizedConv,
    EqualizedLinear,
    ModulatedConv,
    bilinear_resize,
    blur3,
    downsample2x,
    instance_norm,
    l2_normalize,
    upsample2x,
)

RTOL = 1e-5
ATOL = 1e-5


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("hw", [(8, 6), (7, 9), (16, 16)])
def test_bilinear_upsample2x_matches_torch(rng, hw):
    h, w = hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    ours = bilinear_resize(jnp.asarray(x), 2 * h, 2 * w)
    ref = F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("hw", [(8, 6), (7, 9), (15, 13)])
def test_bilinear_downsample_matches_torch(rng, hw):
    h, w = hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    ours = bilinear_resize(jnp.asarray(x), h // 2, w // 2)
    ref = F.interpolate(nchw(x), (h // 2, w // 2), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), rtol=RTOL, atol=ATOL)


def test_blur3_matches_torch(rng):
    x = rng.standard_normal((2, 9, 7, 4)).astype(np.float32)
    ours = blur3(jnp.asarray(x))
    k = torch.tensor([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 16.0
    xt = nchw(x)
    b, c, h, w = xt.shape
    xt = xt.reshape(-1, 1, h, w)
    xt = F.pad(xt, (1, 1, 1, 1), mode="replicate")
    ref = F.conv2d(xt, k[None, None]).reshape(b, c, h, w)
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("hw", [(8, 8), (9, 7)])
def test_up_down_sample_full_pipeline(rng, hw):
    """upsample2x/downsample2x = blur+resize compositions, vs torch."""
    h, w = hw
    x = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    k = torch.tensor([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 16.0

    def torch_blur(t):
        b, c, hh, ww = t.shape
        t = t.reshape(-1, 1, hh, ww)
        t = F.pad(t, (1, 1, 1, 1), mode="replicate")
        return F.conv2d(t, k[None, None]).reshape(b, c, hh, ww)

    up_ref = torch_blur(
        F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    )
    np.testing.assert_allclose(
        np.asarray(upsample2x(jnp.asarray(x))), nhwc(up_ref), rtol=RTOL, atol=ATOL
    )
    down_ref = F.interpolate(
        torch_blur(nchw(x)), (h // 2, w // 2), mode="bilinear", align_corners=False
    )
    np.testing.assert_allclose(
        np.asarray(downsample2x(jnp.asarray(x))), nhwc(down_ref), rtol=RTOL, atol=ATOL
    )


# ---------------------------------------------------------------- norms


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((3, 10, 12, 5)).astype(np.float32)
    ours = instance_norm(jnp.asarray(x))
    ref = F.instance_norm(nchw(x), eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), rtol=1e-4, atol=1e-4)


def test_l2_normalize_matches_torch(rng):
    x = rng.standard_normal((4, 6)).astype(np.float32)
    ours = l2_normalize(jnp.asarray(x), axis=-1)
    ref = F.normalize(torch.from_numpy(x), dim=-1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------- equalized


def test_equalized_linear_matches_oracle(rng):
    x = rng.standard_normal((4, 7)).astype(np.float32)
    mod = EqualizedLinear(5, bias_init=1.0)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    ours = mod.apply(params, jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])  # [in, out]
    b = np.asarray(params["params"]["bias"])
    ref = x @ (w / np.sqrt(7.0)) + b
    assert np.allclose(b, 1.0)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "ksize,padding,pad_mode",
    [(3, 1, "zero"), (7, 3, "reflect"), (4, 1, "zero"), (3, 1, "reflect")],
)
def test_equalized_conv_matches_torch(rng, ksize, padding, pad_mode):
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    mod = EqualizedConv(6, kernel_size=ksize, padding=padding, pad_mode=pad_mode)
    params = mod.init(jax.random.key(1), jnp.asarray(x))
    ours = mod.apply(params, jnp.asarray(x))

    w = np.asarray(params["params"]["weight"])  # HWIO
    b = np.asarray(params["params"]["bias"])
    c = 1.0 / np.sqrt(3 * ksize * ksize)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy()) * c  # OIHW
    xt = nchw(x)
    if pad_mode == "reflect":
        xt = F.pad(xt, (padding,) * 4, mode="reflect")
        ref = F.conv2d(xt, wt, bias=torch.from_numpy(b))
    else:
        ref = F.conv2d(xt, wt, bias=torch.from_numpy(b), padding=padding)
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- modulated


def _torch_modulated_conv(x, weight_hwio, style_w, sw, sb, demodulate, pad, pad_mode):
    """Literal per-sample grouped-conv oracle of StyleGAN2 weight modulation.

    Independent re-statement of the reference math (layers.py:145-182):
    scale weights by the style affine output, demodulate by
    rsqrt(sum(w^2)+eps), then per-sample conv.
    """
    b = x.shape[0]
    in_f = x.shape[1]
    k = weight_hwio.shape[0]
    out_f = weight_hwio.shape[3]
    c_he = 1.0 / np.sqrt(in_f * k * k)
    w_oikk = torch.from_numpy(
        np.transpose(weight_hwio, (3, 2, 0, 1)).copy()
    ) * c_he  # OIHW
    c_lin = 1.0 / np.sqrt(style_w.shape[1])
    s = style_w @ (torch.from_numpy(sw) * c_lin) + torch.from_numpy(sb)  # [B, in]

    weights = w_oikk[None] * s[:, None, :, None, None]  # [B, O, I, k, k]
    if demodulate:
        sigma_inv = torch.rsqrt((weights**2).sum(dim=(2, 3, 4), keepdim=True) + 1e-8)
        weights = weights * sigma_inv
    if pad_mode == "reflect":
        x = F.pad(x, (pad,) * 4, mode="reflect")
        pad = 0
    h, w = x.shape[2], x.shape[3]
    x = x.reshape(1, -1, h, w)
    weights = weights.reshape(b * out_f, in_f, k, k)
    y = F.conv2d(x, weights, padding=pad, groups=b)
    return y.reshape(b, out_f, y.shape[2], y.shape[3])


@pytest.mark.parametrize("pad_mode", ["zero", "reflect"])
@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_matches_grouped_oracle(rng, pad_mode, demodulate):
    """Our activation-scaling formulation == reference's grouped conv."""
    batch, in_f, out_f, w_dim = 3, 4, 5, 6
    x = rng.standard_normal((batch, 8, 8, in_f)).astype(np.float32)
    wv = rng.standard_normal((batch, w_dim)).astype(np.float32)

    mod = ModulatedConv(
        out_f, kernel_size=3, padding=1, pad_mode=pad_mode, demodulate=demodulate
    )
    params = mod.init(jax.random.key(2), jnp.asarray(x), jnp.asarray(wv))
    ours = mod.apply(params, jnp.asarray(x), jnp.asarray(wv))

    p = params["params"]
    ref = _torch_modulated_conv(
        nchw(x),
        np.asarray(p["weight"]),
        torch.from_numpy(wv),
        np.asarray(p["to_style"]["weight"]),
        np.asarray(p["to_style"]["bias"]),
        demodulate,
        1,
        pad_mode,
    )
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), rtol=1e-4, atol=1e-4)


def test_modulated_conv_zero_style_is_unit_modulation(rng):
    """With w=0, the style affine's bias-init-1 gives s=1: plain conv."""
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    wv = np.zeros((2, 4), dtype=np.float32)
    mod = ModulatedConv(3, kernel_size=3, padding=1, demodulate=False)
    params = mod.init(jax.random.key(3), jnp.asarray(x), jnp.asarray(wv))
    s_expected = np.ones((2, 3))
    c_lin = 1.0 / np.sqrt(4)
    s_actual = wv @ np.asarray(params["params"]["to_style"]["weight"]) * c_lin + 1.0
    np.testing.assert_allclose(s_actual, s_expected)


# ----------------------------------------- s2d-packed 3x3 conv (ROADMAP 5b)


def test_conv3x3_s2d_packed_exact():
    """The 2x space-to-depth-packed formulation equals the direct VALID
    conv to float tolerance at an eligible shape."""
    from one_to_many_gan_tpu.ops.equalized import (
        conv3x3_s2d_packed,
        s2d_pack_eligible,
    )

    r = np.random.default_rng(0)
    xp = jnp.asarray(r.standard_normal((2, 204, 208, 5)).astype(np.float32))
    w = jnp.asarray(r.standard_normal((3, 3, 5, 7)).astype(np.float32))
    assert s2d_pack_eligible(xp, 3, 3, 1)
    direct = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    packed = conv3x3_s2d_packed(xp, w)
    assert packed.shape == direct.shape == (2, 202, 206, 7)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(direct), rtol=1e-5, atol=1e-4
    )


def test_equalized_conv_s2d_in_exact():
    """EqualizedConv with s2d_in on matches the direct path exactly
    (same params) at an eligible shape, including gradients."""
    from one_to_many_gan_tpu.ops import EqualizedConv

    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((1, 202, 202, 4)).astype(np.float32))
    conv_a = EqualizedConv(6, 3, padding=1, s2d_in=False)
    conv_b = EqualizedConv(6, 3, padding=1, s2d_in=True)
    params = conv_a.init(jax.random.key(0), x)
    ya = conv_a.apply(params, x)
    yb = conv_b.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-4
    )
    ga = jax.grad(lambda z: jnp.sum(conv_a.apply(params, z) ** 2))(x)
    gb = jax.grad(lambda z: jnp.sum(conv_b.apply(params, z) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-3
    )


def test_modulated_conv_s2d_in_exact():
    """ModulatedConv s2d_in: modulation/demodulation commute with the
    subpixel packing."""
    from one_to_many_gan_tpu.ops import ModulatedConv

    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((2, 202, 202, 4)).astype(np.float32))
    ws = jnp.asarray(r.standard_normal((2, 6)).astype(np.float32))
    conv_a = ModulatedConv(8, 3, padding=1, s2d_in=False)
    conv_b = ModulatedConv(8, 3, padding=1, s2d_in=True)
    params = conv_a.init(jax.random.key(0), x, ws)
    ya = conv_a.apply(params, x, ws)
    yb = conv_b.apply(params, x, ws)
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-4
    )


def test_s2d_pack_ineligible_shapes_fall_back():
    from one_to_many_gan_tpu.ops.equalized import s2d_pack_eligible

    x_small = jnp.zeros((1, 66, 66, 4))
    assert not s2d_pack_eligible(x_small, 3, 3, 1)  # spatial too small
    x_wide = jnp.zeros((1, 204, 204, 256))
    assert not s2d_pack_eligible(x_wide, 3, 3, 1)  # too many channels
    x_ok = jnp.zeros((1, 204, 204, 64))
    assert not s2d_pack_eligible(x_ok, 4, 4, 1)  # only 3x3
    assert not s2d_pack_eligible(x_ok, 3, 3, 2)  # only stride 1
    assert s2d_pack_eligible(x_ok, 3, 3, 1)
