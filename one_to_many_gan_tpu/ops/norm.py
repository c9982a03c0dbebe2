"""Normalization ops (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel spatial normalization, no affine params.

    Matches torch ``nn.InstanceNorm2d`` defaults (affine=False, eps=1e-5,
    biased variance) used throughout the reference models
    (src/model/builder.py, src/model/blocks.py). Statistics are always
    accumulated in float32.

    bf16 fast path: statistics via E[x^2]-E[x]^2 with f32 accumulation
    (both reductions fuse into one pass over the bf16 data), normalization
    arithmetic in bf16 — one bf16 read+write instead of f32 round-trips.
    Activations here are unit-scale, so the cancellation error of the
    moment trick is far below bf16 resolution.
    """
    if x.dtype == jnp.bfloat16:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        sq = jnp.mean(
            jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True
        )
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        scale = jax.lax.rsqrt(var + eps).astype(jnp.bfloat16)
        return (x - mean.astype(jnp.bfloat16)) * scale
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalization matching torch ``F.normalize`` (clamped norm)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
