"""Anti-aliased resampling ops (NHWC), TPU-native formulations.

Behavioral contract (reference: src/model/layers.py:191-247):

- ``blur3``: fixed 3x3 binomial blur [[1,2,1],[2,4,2],[1,2,1]]/16 applied
  per channel after a 1-pixel replication (edge) pad.
- ``upsample2x``: bilinear 2x (half-pixel centers, no anti-aliasing),
  then blur.
- ``downsample2x``: blur, then bilinear resize to (H//2, W//2).

Bilinear sampling follows torch's ``align_corners=False, antialias=False``
convention exactly: source coordinate ``max(0, (dst+0.5)*in/out - 0.5)``,
two-tap lerp, upper index clamped (``jax.image.resize`` is unusable here —
it anti-aliases when shrinking).

TPU-native design — NO gathers anywhere (TPU gathers run near scalar
speed; these ops are called dozens of times per train step):

- general ``bilinear_resize``: per-axis **dense interpolation-matrix
  matmuls** (out = A_h @ x @ A_w^T per channel). The matrices are built in
  numpy at trace time from the exact two-tap weights, so the op is a pair
  of MXU matmuls.
- even-size 2x paths: the blur and the 2x resample fuse algebraically
  into short separable FIR filters evaluated with **strided slices and
  adds** (VPU, bandwidth-bound):
    * blur+halve  = 4-tap [1,3,3,1]/8, stride 2, per axis, edge-padded;
    * double+blur = 2-phase 3-tap filter (even [5,10,1]/16,
      odd [1,10,5]/16) per axis (the [1,5,10,10,5,1]/16 stride-2
      transposed kernel split into its polyphase components).
  Both are exact reassociations of blur3 + the two-tap resize.
- ``blur3`` itself: separable [1,2,1]/4 via shifted adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _edge_pad_axis(x: jax.Array, axis: int, lo: int = 1, hi: int = 1) -> jax.Array:
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (lo, hi)
    return jnp.pad(x, cfg, mode="edge")


def _depthwise_1d(
    x: jax.Array,
    taps: tuple[float, ...],
    axis: int,
    *,
    stride: int = 1,
    lhs_dilation: int = 1,
    conv_pad: tuple[int, int] = (0, 0),
) -> jax.Array:
    """Depthwise 1D FIR along H (axis=1) or W (axis=2), NHWC.

    Convs keep the TPU's native tiled layout; strided slices / stack+reshape
    interleaves force padded relayout copies (measured ~80x slower)."""
    c = x.shape[-1]
    k = jnp.asarray(taps, dtype=x.dtype)
    if axis == 1:
        kernel = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
        strides = (stride, 1)
        dil = (lhs_dilation, 1)
        padding = [conv_pad, (0, 0)]
    else:
        kernel = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
        strides = (1, stride)
        dil = (1, lhs_dilation)
        padding = [(0, 0), conv_pad]
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        strides,
        padding,
        lhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _blur1d(x: jax.Array, axis: int) -> jax.Array:
    """[1,2,1]/4 with edge padding along one axis."""
    return _depthwise_1d(_edge_pad_axis(x, axis), (0.25, 0.5, 0.25), axis)


def blur3(x: jax.Array) -> jax.Array:
    """Depthwise 3x3 binomial blur with replication padding, NHWC.

    Separable: [1,2,1]/4 along H then W (edge padding commutes across
    axes), exactly the reference Smooth (layers.py:191-214).
    """
    return _blur1d(_blur1d(x, 1), 2)


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] two-tap bilinear interpolation matrix (torch
    half-pixel convention, negative source clamped to 0)."""
    a = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum((dst + 0.5) * scale - 0.5, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(a, (rows, lo), 1.0 - frac)
    np.add.at(a, (rows, hi), frac)
    return a


def _resize_axis_linear(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """Two-tap linear resize along one axis as a dense matmul (MXU)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = jnp.asarray(_interp_matrix(in_size, out_size), dtype=x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = moved @ mat.T
    return jnp.moveaxis(out, -1, axis)


def bilinear_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of NHWC images; no anti-aliasing (torch semantics)."""
    x = _resize_axis_linear(x, out_h, axis=1)
    return _resize_axis_linear(x, out_w, axis=2)


# --------------------------------------------------- PIL-convention bicubic


def _pil_bicubic_kernel(t: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic (Keys, a=-0.5), support 2."""
    t = np.abs(t)
    return np.where(
        t < 1.0,
        ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, a * (((t - 5.0) * t + 8.0) * t - 4.0), 0.0),
    )


@functools.lru_cache(maxsize=16)
def _pil_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] matrix reproducing PIL ``Image.resize`` with
    ``Resampling.BICUBIC`` exactly (including its antialiasing: the filter
    support scales with the reduction ratio, and weights are normalized).

    This is clean-fid's defining resize convention (its "clean" resizer is
    PIL bicubic on float32 channels), rebuilt from the published PIL
    ``precompute_coeffs`` algorithm.
    """
    a = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax)
        w = _pil_bicubic_kernel((taps - center + 0.5) / filterscale)
        a[i, xmin:xmax] = w / w.sum()
    return a.astype(np.float32)


def pil_bicubic_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """PIL-exact bicubic antialiased resize of NHWC images (two MXU
    matmuls; the clean-fid 299x299 eval resize)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_pil_bicubic_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_pil_bicubic_matrix(w, out_w), dtype=x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, y)


# ------------------------------------------------------------- 2x fast paths


def _blur_halve_axis(x: jax.Array, axis: int) -> jax.Array:
    """Fused [1,2,1]/4 blur + 2-tap halving along one even axis: depthwise
    4-tap [1,3,3,1]/8, stride 2, on the edge-padded sequence (exact
    reassociation of blur + the two-tap resize; verified vs torch)."""
    k = (0.125, 0.375, 0.375, 0.125)
    return _depthwise_1d(_edge_pad_axis(x, axis), k, axis, stride=2)


def _double_blur_axis(x: jax.Array, axis: int) -> jax.Array:
    """Fused 2x bilinear upsample + [1,2,1]/4 blur along one axis.

    Polyphase taps over the edge-padded input: even output [5,10,1]/16 on
    (x[k-1], x[k], x[k+1]); odd output [1,10,5]/16. The edge clamp makes
    these formulas exact at the borders too: e.g. at k=0,
    (5x[0]+10x[0]+x[1])/16 = (15x[0]+x[1])/16, which is precisely the
    unfused pipeline's z[0] = (3*up[0] + up[1])/4 with up[0]=x[0] (clamped
    source coordinate) and up[1]=(3x[0]+x[1])/4.
    """
    k = (1 / 16, 5 / 16, 10 / 16, 10 / 16, 5 / 16, 1 / 16)
    return _depthwise_1d(
        _edge_pad_axis(x, axis), k, axis, lhs_dilation=2, conv_pad=(1, 1)
    )


def upsample2x(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample then smooth (reference UpSample, layers.py:217-229)."""
    return _double_blur_axis(_double_blur_axis(x, 1), 2)


def downsample2x(x: jax.Array) -> jax.Array:
    """Smooth then bilinear downsample to (H//2, W//2) (reference DownSample,
    layers.py:232-247)."""
    _, h, w, _ = x.shape
    if h % 2 == 0 and w % 2 == 0:
        return _blur_halve_axis(_blur_halve_axis(x, 1), 2)
    return bilinear_resize(blur3(x), h // 2, w // 2)
