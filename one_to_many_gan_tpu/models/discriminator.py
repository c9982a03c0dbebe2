"""Discriminator and StyleExtractor.

Behavioral contract (reference: src/model/builder.py:259-320): PatchGAN
trunk of equalized 4x4 convs (zero pad 1, stride 1) with anti-aliased
DownSample between stages and LeakyReLU(0.2); the discriminator ends with
a 1-channel patch-logit conv (no sigmoid; LSGAN), the style extractor ends
with global average pooling and an equalized linear to w_dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from one_to_many_gan_tpu.ops import (
    EqualizedConv,
    EqualizedLinear,
    downsample2x,
    instance_norm,
)


def _trunk(x: jax.Array, dtype: jnp.dtype) -> jax.Array:
    x = EqualizedConv(64, 4, padding=1, dtype=dtype)(x)
    x = jax.nn.leaky_relu(x, negative_slope=0.2)
    x = downsample2x(x)
    for features in (128, 256):
        x = EqualizedConv(features, 4, padding=1, dtype=dtype)(x)
        x = instance_norm(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        x = downsample2x(x)
    x = EqualizedConv(512, 4, padding=1, dtype=dtype)(x)
    x = instance_norm(x)
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class Discriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _trunk(x.astype(self.dtype), self.dtype)
        # No s2d_out here: the 4x4 pad-1 head conv's output is odd-sized
        # (29^2 at 256^2 input, 61^2 at 512^2), never divisible by the
        # subpixel factor, so the space-to-depth formulation can never
        # activate on the D head — the measured +6% (BASELINE.md) comes
        # solely from the generator's out_conv.
        return EqualizedConv(1, 4, padding=1, dtype=self.dtype, s2d_out=0)(x)


class StyleExtractor(nn.Module):
    w_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _trunk(x.astype(self.dtype), self.dtype)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        return EqualizedLinear(self.w_dim, dtype=jnp.float32)(x.astype(jnp.float32))
