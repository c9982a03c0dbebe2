"""Normalization ops (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel spatial normalization, no affine params.

    Matches torch ``nn.InstanceNorm2d`` defaults (affine=False, eps=1e-5,
    biased variance) used throughout the reference models
    (src/model/builder.py, src/model/blocks.py). Statistics are computed in
    float32 regardless of input dtype for bf16 safety.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(orig_dtype)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalization matching torch ``F.normalize`` (clamped norm)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
