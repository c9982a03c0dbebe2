"""tpu.g_loss_split: the two-sub-backward G phase is exact (VERDICT r3 #4).

Grads of a sum = sum of grads, so splitting the six-term G backward into
{kl,rec,idt,gan,style} and {path} legs must reproduce the fused phase's
loss terms bit-for-bit (same forward draws) and its parameter updates up
to float reassociation of the gradient accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import Batches, make_phase_fns
from one_to_many_gan_tpu.presets import tiny_config


def _setup(g_loss_split: bool, *, latent_noise: bool = False):
    config = tiny_config(
        (32, 32),
        4,
        min_latent=16,
        w_dim=6,
        n_resnet_blocks=3,
        tpu={"g_loss_split": g_loss_split},
        architecture={"add_latent_noise": latent_noise},
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    _, g_phase = make_phase_fns(config, models)
    return state, jax.jit(g_phase)


def _batches():
    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray((rng.random((4, 32, 32, 1)) * 2 - 1).astype(np.float32))

    return Batches(mk(), mk(), mk(), mk())


@pytest.mark.parametrize("latent_noise", [False, True])
def test_split_g_backward_matches_fused(latent_noise):
    batches = _batches()
    rng = jax.random.key(5)
    p = jnp.zeros(())
    state_f, fused = _setup(False, latent_noise=latent_noise)
    state_s, split = _setup(True, latent_noise=latent_noise)
    new_f, m_f = fused(state_f, batches, rng, p)
    new_s, m_s = split(state_s, batches, rng, p)

    # loss terms: identical forward draws -> near-bitwise (XLA may fuse
    # the two programs differently, so allow float noise)
    assert set(m_f) == set(m_s)
    for k in m_f:
        np.testing.assert_allclose(
            np.asarray(m_f[k]), np.asarray(m_s[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"loss term {k}",
        )

    # parameter updates: equal up to reassociation of the grad sums. A
    # near-zero gradient element can flip SIGN under reassociation, and
    # first-step Adam turns any sign flip into a ±lr update (m/sqrt(v) is
    # ±1 regardless of magnitude) — so the per-element bound is 2*lr, not
    # a small relative tolerance.
    lrs = {"params_g": 2e-3, "params_m": 2e-5, "params_s": 2e-3}
    for name, lr in lrs.items():
        for a, b in zip(
            jax.tree.leaves(getattr(new_f, name)),
            jax.tree.leaves(getattr(new_s, name)),
            strict=True,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2.1 * lr,
                err_msg=name,
            )


def test_split_under_mesh_matches_fused():
    """The split legs shard identically (written on global arrays)."""
    from one_to_many_gan_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh(4, 2)
    outs = {}
    for split_flag in (False, True):
        config = tiny_config(
            (32, 32), 8, min_latent=16, w_dim=6, n_resnet_blocks=3,
            tpu={"g_loss_split": split_flag, "spatial_parallel": 2},
        )
        models = Models(config)
        state = replicate(
            mesh, init_train_state(config, models, jax.random.key(0))
        )
        _, g_phase = make_phase_fns(config, models, mesh)
        rng_np = np.random.default_rng(1)

        def mk():
            return shard_batch(
                mesh, (rng_np.random((8, 32, 32, 1)) * 2 - 1).astype(np.float32)
            )

        batches = Batches(mk(), mk(), mk(), mk())
        _, metrics = jax.jit(g_phase)(
            state, batches, jax.random.key(2), jnp.zeros(())
        )
        outs[split_flag] = {k: float(v) for k, v in metrics.items()}
    for k, v in outs[False].items():
        np.testing.assert_allclose(outs[True][k], v, rtol=1e-5, atol=1e-6)
