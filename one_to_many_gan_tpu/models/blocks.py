"""Residual blocks (reference: src/model/blocks.py).

- ``ResnetBlock``: reflect-pad 1 -> eq-conv3 -> InstanceNorm -> ReLU ->
  reflect-pad 1 -> eq-conv3 -> InstanceNorm, residual add (blocks.py:9-33).
- ``ModulatedResnetBlock``: reflect-pad 1 -> modulated conv3 -> ReLU ->
  reflect-pad 1 -> modulated conv3, residual add; the SAME style vector w
  feeds both convs (blocks.py:36-68).

Reflection pads are folded into the conv ops (pad_mode="reflect").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from one_to_many_gan_tpu.ops import EqualizedConv, ModulatedConv, instance_norm


class ResnetBlock(nn.Module):
    dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = EqualizedConv(
            self.dim, 3, padding=1, pad_mode="reflect", use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        y = jax.nn.relu(instance_norm(y))
        y = EqualizedConv(
            self.dim, 3, padding=1, pad_mode="reflect", use_bias=self.use_bias,
            dtype=self.dtype,
        )(y)
        y = instance_norm(y)
        return x + y


class ModulatedResnetBlock(nn.Module):
    dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    # inference-only int8 convs (ops/modulated.py); same param tree
    int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        y = ModulatedConv(
            self.dim, 3, padding=1, pad_mode="reflect", use_bias=self.use_bias,
            dtype=self.dtype, int8=self.int8,
        )(x, w)
        y = jax.nn.relu(y)
        y = ModulatedConv(
            self.dim, 3, padding=1, pad_mode="reflect", use_bias=self.use_bias,
            dtype=self.dtype, int8=self.int8,
        )(y, w)
        return x + y
