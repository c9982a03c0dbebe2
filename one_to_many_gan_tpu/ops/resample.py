"""Anti-aliased resampling ops (NHWC).

Behavioral contract (reference: src/model/layers.py:191-247):

- ``blur3``: fixed 3x3 binomial blur [[1,2,1],[2,4,2],[1,2,1]]/16 applied
  depthwise after a 1-pixel replication (edge) pad.
- ``upsample2x``: bilinear 2x (half-pixel centers, no anti-aliasing),
  then blur.
- ``downsample2x``: blur, then bilinear resize to (H//2, W//2).

The bilinear resize reproduces torch's ``align_corners=False,
antialias=False`` sampling exactly: source coordinate
``max(0, (dst + 0.5) * in/out - 0.5)``, two-tap lerp with the upper index
clamped to ``in - 1``.  ``jax.image.resize`` cannot be used here because it
anti-aliases when shrinking.  Implemented as two separable gather+lerp
passes; on TPU these lower to cheap vectorized gathers and fuse with
surrounding elementwise work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 3x3 binomial kernel, normalized. Shape HWIO for depthwise conv.
_BLUR_KERNEL = (
    np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], dtype=np.float32)
    / 16.0
)


def blur3(x: jax.Array) -> jax.Array:
    """Depthwise 3x3 binomial blur with replication padding, NHWC."""
    c = x.shape[-1]
    kernel = jnp.asarray(_BLUR_KERNEL, dtype=x.dtype)
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 per group
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@functools.partial(jax.jit, static_argnames=("out_size", "axis"))
def _resize_axis_linear(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """Two-tap linear resize along one axis, torch half-pixel convention."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = jnp.maximum((dst + 0.5) * scale - 0.5, 0.0)
    lo = jnp.floor(src)
    frac = (src - lo).astype(x.dtype)
    lo_idx = lo.astype(jnp.int32)
    hi_idx = jnp.minimum(lo_idx + 1, in_size - 1)
    a = jnp.take(x, lo_idx, axis=axis)
    b = jnp.take(x, hi_idx, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return a + (b - a) * frac


def bilinear_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of NHWC images; no anti-aliasing (torch semantics)."""
    x = _resize_axis_linear(x, out_h, axis=1)
    return _resize_axis_linear(x, out_w, axis=2)


def upsample2x(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample then smooth (reference UpSample, layers.py:217-229)."""
    _, h, w, _ = x.shape
    return blur3(bilinear_resize(x, 2 * h, 2 * w))


def downsample2x(x: jax.Array) -> jax.Array:
    """Smooth then bilinear downsample to (H//2, W//2) (reference DownSample,
    layers.py:232-247)."""
    _, h, w, _ = x.shape
    return bilinear_resize(blur3(x), h // 2, w // 2)
