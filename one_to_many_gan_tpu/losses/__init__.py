"""Loss library (reference: src/model/loss.py:55-111, src/core/training.py).

All functions are pure and jit-compatible. Reductions are plain ``jnp.mean``
over global arrays — under a data-parallel mesh XLA inserts the cross-replica
reductions automatically, preserving the reference's *global-batch*
statistics (notably the KL loss, loss.py:86-87).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from one_to_many_gan_tpu.ops import l2_normalize


def lsgan_d_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """LSGAN discriminator loss: (MSE(real, 1) + MSE(fake, 0)) / 2
    (training.py:111-113)."""
    real_loss = jnp.mean(jnp.square(real_scores - 1.0))
    fake_loss = jnp.mean(jnp.square(fake_scores))
    return (real_loss + fake_loss) / 2.0


def lsgan_g_loss(fake_scores: jax.Array) -> jax.Array:
    """LSGAN generator loss: MSE(fake, 1) (training.py:202-204)."""
    return jnp.mean(jnp.square(fake_scores - 1.0))


def discriminator_confidence(scores: jax.Array) -> jax.Array:
    """Mean sign of scores rescaled from [0,1]-target space to [-1,1]
    (training.py:86): sign(2*score - 1).mean()."""
    return jnp.mean(jnp.sign(scores * 2.0 - 1.0))


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def style_cycle_loss(
    original_w: jax.Array,
    reconstructed_w: jax.Array,
    *,
    normalise: bool = True,
    cos_l2_ratio: float = 0.2,
) -> jax.Array:
    """1 - cos_sim + ratio * MSE between (optionally normalized) styles
    (loss.py:60-75). Inputs [B, w_dim]."""
    a = original_w.astype(jnp.float32)
    b = reconstructed_w.astype(jnp.float32)
    if normalise:
        a = l2_normalize(a, axis=-1)
        b = l2_normalize(b, axis=-1)
    # torch cosine_similarity clamps the norm product at eps=1e-8
    denom = jnp.maximum(
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-8
    )
    cos = jnp.sum(a * b, axis=-1) / denom
    cos_loss = 1.0 - jnp.mean(cos)
    l2 = jnp.mean(jnp.square(a - b))
    return cos_loss + cos_l2_ratio * l2


def kl_loss(combined_latents: jax.Array) -> jax.Array:
    """Domain-alignment loss pushing latents toward N(0,1): mean^2 + (var-1)^2
    over the WHOLE (global) batch, biased variance (loss.py:82-92)."""
    x = combined_latents.astype(jnp.float32)
    mean = jnp.mean(x)
    var = jnp.mean(jnp.square(x - mean))
    return jnp.square(mean) + jnp.square(var - 1.0)


def path_loss(
    features1: list[jax.Array],
    features2: list[jax.Array],
    cent_fin_diff_h: jax.Array,
) -> jax.Array:
    """Finite-difference Jacobian energy over θ, averaged across the
    generator's style-block feature taps (loss.py:98-111).

    ``cent_fin_diff_h``: per-sample step sizes [B]; features are NHWC.
    """
    h = cent_fin_diff_h.astype(jnp.float32)[:, None, None, None]
    total = jnp.zeros((), dtype=jnp.float32)
    for f1, f2 in zip(features1, features2, strict=True):
        jac = (f1.astype(jnp.float32) - f2.astype(jnp.float32)) / h
        total = total + jnp.mean(jnp.square(jac))
    return total / len(features1)


def r1_penalty(d_apply, params, real_images: jax.Array) -> jax.Array:
    """R1 gradient penalty: E[|grad_x D(x)|^2] on real images.

    New opt-in capability (BASELINE.json config 3); not present in the
    reference. Uses mean patch logit as the scalar output.
    """

    def scalar_d(x):
        return jnp.sum(jnp.mean(d_apply(params, x), axis=(1, 2, 3)))

    grads = jax.grad(scalar_d)(real_images)
    return jnp.mean(jnp.sum(jnp.square(grads.astype(jnp.float32)), axis=(1, 2, 3)))
