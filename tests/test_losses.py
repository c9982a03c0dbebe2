"""Loss-function tests against hand-computed values and torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from one_to_many_gan_tpu.losses import (
    discriminator_confidence,
    kl_loss,
    l1_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    path_loss,
    style_cycle_loss,
)

rng = np.random.default_rng(7)


def test_lsgan_losses():
    real = jnp.asarray([[1.0, 0.5]])
    fake = jnp.asarray([[0.0, 0.5]])
    # real: mean((x-1)^2) = (0 + 0.25)/2; fake: mean(x^2) = (0 + 0.25)/2
    np.testing.assert_allclose(float(lsgan_d_loss(real, fake)), 0.125)
    np.testing.assert_allclose(float(lsgan_g_loss(fake)), (1.0 + 0.25) / 2)


def test_discriminator_confidence():
    scores = jnp.asarray([0.9, 0.1, 0.6, 0.4])  # signs: +1, -1, +1, -1
    np.testing.assert_allclose(float(discriminator_confidence(scores)), 0.0)
    np.testing.assert_allclose(
        float(discriminator_confidence(jnp.asarray([0.9, 0.8]))), 1.0
    )


def test_kl_loss_matches_torch():
    x = rng.standard_normal((4, 8, 8, 16)).astype(np.float32) * 1.7 + 0.3
    ours = float(kl_loss(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    mean = xt.mean()
    var = xt.var(correction=0)
    ref = float(mean**2 + (var - 1) ** 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_style_cycle_loss_matches_torch():
    a = rng.standard_normal((6, 6)).astype(np.float32)
    b = rng.standard_normal((6, 6)).astype(np.float32)
    ours = float(style_cycle_loss(jnp.asarray(a), jnp.asarray(b)))
    at = F.normalize(torch.from_numpy(a), dim=-1)
    bt = F.normalize(torch.from_numpy(b), dim=-1)
    cos = 1 - F.cosine_similarity(at, bt, dim=-1).mean()
    l2 = F.mse_loss(at, bt)
    ref = float(cos + 0.2 * l2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_path_loss_matches_torch():
    f1 = [rng.standard_normal((2, 4, 4, 3)).astype(np.float32) for _ in range(3)]
    f2 = [rng.standard_normal((2, 4, 4, 3)).astype(np.float32) for _ in range(3)]
    h = np.asarray([0.15, 0.12], dtype=np.float32)
    ours = float(
        path_loss([jnp.asarray(f) for f in f1], [jnp.asarray(f) for f in f2],
                  jnp.asarray(h))
    )
    total = torch.zeros(())
    ht = torch.from_numpy(h)[:, None, None, None]
    for a, b in zip(f1, f2, strict=True):
        # torch oracle works in NCHW; mean is layout-invariant
        at = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())
        bt = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)).copy())
        jac = (at - bt) / ht
        total = total + (jac**2).mean()
    ref = float(total / 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_l1_loss():
    a = jnp.asarray([1.0, 2.0])
    b = jnp.asarray([0.0, 4.0])
    np.testing.assert_allclose(float(l1_loss(a, b)), 1.5)
