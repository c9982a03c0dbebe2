"""Mapping network: latent z -> style w, with the continuous domain variable.

Behavioral contract (reference: src/model/builder.py:16-132):

- forward: L2-normalize z over features, then ``n_layers`` equalized
  linear layers with LeakyReLU(0.2), the LAST activation swapped for ReLU
  so the style vector can be exactly zero (builder.py:35-36).
- the "shoeprint style" (domain θ=0) is the all-zeros vector, so the
  domain interpolation ``lerp(0, s, θ)`` reduces to ``θ * s``.
- style mixing: with probability ``style_mixing_prob`` two z's are mapped
  and crossed over at a random block index along the per-generator-block
  axis (builder.py:106-132). The reference's dynamic ``expand``/``cat`` is
  reformulated as a jit-stable mask over the block axis.

All style math runs in float32 (tiny tensors; precision matters for the
demodulation statistics downstream).

Style-vector shape convention matches the reference: [n_blocks, B, w_dim].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from one_to_many_gan_tpu.ops import EqualizedLinear, l2_normalize


class StyleRngs(NamedTuple):
    """Random draws consumed by one style-vector sample."""

    z1: jax.Array  # [B, w_dim] standard normal
    z2: jax.Array  # [B, w_dim] standard normal
    mix: jax.Array  # scalar bool: use style mixing this draw
    crossover: jax.Array  # scalar int32 in [0, n_blocks)


def sample_style_rngs(
    rng: jax.Array, batch_size: int, w_dim: int, n_blocks: int, mixing_prob: float
) -> StyleRngs:
    """Draw the raw randomness for one style-vector sample."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return StyleRngs(
        z1=jax.random.normal(k1, (batch_size, w_dim), dtype=jnp.float32),
        z2=jax.random.normal(k2, (batch_size, w_dim), dtype=jnp.float32),
        mix=jax.random.uniform(k3, ()) < mixing_prob,
        crossover=jax.random.randint(k4, (), 0, n_blocks),
    )


def apply_domain(style: jax.Array, domain: jax.Array | float) -> jax.Array:
    """Interpolate between the zero "shoeprint style" and ``style`` by θ.

    ``lerp(0, s, θ) == θ * s`` (builder.py:67-73, 96-104). ``domain`` may be
    a scalar or a per-sample [B] vector.
    """
    d = jnp.asarray(domain, dtype=style.dtype)
    if d.ndim == 0:
        d = d.reshape(1, 1, 1)
    else:
        d = d.reshape(1, -1, 1)
    return style * d


class MappingNetwork(nn.Module):
    features: int
    n_layers: int = 2

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = l2_normalize(z.astype(jnp.float32), axis=1)
        for i in range(self.n_layers):
            x = EqualizedLinear(self.features, dtype=jnp.float32)(x)
            if i == self.n_layers - 1:
                x = jax.nn.relu(x)
            else:
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
        return x

    def style_vector(self, rngs: StyleRngs, n_blocks: int, *, mix_styles: bool = True):
        """Per-block style stack [n_blocks, B, features] with optional mixing."""
        s1 = self(rngs.z1)
        if not mix_styles:
            return jnp.broadcast_to(s1[None], (n_blocks, *s1.shape))
        s2 = self(rngs.z2)
        block_idx = jnp.arange(n_blocks)[:, None, None]
        mixed = jnp.where(block_idx < rngs.crossover, s1[None], s2[None])
        plain = jnp.broadcast_to(s1[None], (n_blocks, *s1.shape))
        return jnp.where(rngs.mix, mixed, plain)
