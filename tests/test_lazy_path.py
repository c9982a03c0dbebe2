"""tpu.path_interval: lazy path-length regularization (VERDICT r4 #1).

StyleGAN2's lazy-regularization trick applied to the θ-path term
(reference src/core/training.py:212-234 — a 2B decoder extract every
step): run the path sub-backward only every ``path_interval`` steps with
its weight scaled by the interval. Contracts pinned here:

- interval=1 is bit-identical to the default step (the reference-exact
  every-step path term — the code path is untouched);
- on-interval steps equal the g_loss_split two-backward structure with
  path_loss_lambda scaled by the interval (scaling by powers of two
  commutes exactly with float rounding, so interval=2 compares bitwise
  up to program-level reassociation);
- off-interval steps equal the same structure with the path grads exactly
  zero (λ=0 zeroes every path cotangent on finite values), and report
  path_loss = 0;
- under the fused multi-step driver the on/off cadence follows the global
  step counter.
"""

import jax
import jax.numpy as jnp
import numpy as np

from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import (
    Batches,
    make_phase_fns,
    make_train_step,
)
from one_to_many_gan_tpu.presets import tiny_config


def _setup(*, path_interval: int = 1, g_loss_split: bool = False,
           path_lambda: float = 0.1):
    config = tiny_config(
        (32, 32),
        4,
        min_latent=16,
        w_dim=6,
        n_resnet_blocks=3,
        tpu={"g_loss_split": g_loss_split, "path_interval": path_interval},
        optimisation={"path_loss_lambda": path_lambda},
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    return config, models, state


def _batches(batch=4, size=32):
    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray(
            (rng.random((batch, size, size, 1)) * 2 - 1).astype(np.float32)
        )

    return Batches(mk(), mk(), mk(), mk())


def _params_close(state_a, state_b, *, exact=False):
    lrs = {"params_g": 2e-3, "params_m": 2e-5, "params_s": 2e-3}
    for name, lr in lrs.items():
        for a, b in zip(
            jax.tree.leaves(getattr(state_a, name)),
            jax.tree.leaves(getattr(state_b, name)),
            strict=True,
        ):
            if exact:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=name
                )
            else:
                # reassociation can flip near-zero grad signs; first-step
                # Adam turns a sign flip into ±lr (see test_g_loss_split)
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2.1 * lr,
                    err_msg=name,
                )


def test_interval_one_is_bit_identical_to_default():
    """path_interval=1 must not change the program at all."""
    batches = _batches()
    rng = jax.random.key(5)
    p = jnp.zeros(())
    outs = []
    for interval in (1, 1):
        config, models, state = _setup(path_interval=interval)
        _, g_phase = make_phase_fns(config, models)
        outs.append(jax.jit(g_phase)(state, batches, rng, p))
    new_a, m_a = outs[0]
    new_b, m_b = outs[1]
    for k in m_a:
        np.testing.assert_array_equal(np.asarray(m_a[k]), np.asarray(m_b[k]))
    _params_close(new_a, new_b, exact=True)


def test_on_interval_matches_split_with_scaled_lambda():
    """Step 0 with interval=2 == g_loss_split with λ_path doubled."""
    batches = _batches()
    rng = jax.random.key(5)
    p = jnp.zeros(())

    config_l, models_l, state_l = _setup(path_interval=2, path_lambda=0.1)
    _, g_lazy = make_phase_fns(config_l, models_l)
    new_l, m_l = jax.jit(g_lazy)(state_l, batches, rng, p)

    config_s, models_s, state_s = _setup(g_loss_split=True, path_lambda=0.2)
    _, g_split = make_phase_fns(config_s, models_s)
    new_s, m_s = jax.jit(g_split)(state_s, batches, rng, p)

    # raw path metric is unscaled in the lazy variant; weighted term and
    # grads carry the 2x. Everything else must line up.
    assert float(m_l["path_loss"]) > 0
    np.testing.assert_allclose(
        np.asarray(m_l["path_loss"]), np.asarray(m_s["path_loss"]),
        rtol=1e-5, atol=1e-7,
    )
    for k in ("total_gen_loss", "gan_loss", "reconstruction_loss",
              "identity_loss", "kl_loss", "style_loss"):
        np.testing.assert_allclose(
            np.asarray(m_l[k]), np.asarray(m_s[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
    _params_close(new_l, new_s)


def test_on_interval_matches_plain_fused_with_scaled_lambda():
    """The joint-cond structure (g_loss_split=False): an on-interval step
    is the EXACT anchor joint backward with λ_path scaled — not the
    two-sub-backward form (which would re-pay a 2B encode forward)."""
    batches = _batches()
    rng = jax.random.key(5)
    p = jnp.zeros(())

    config_l, models_l, state_l = _setup(path_interval=2, path_lambda=0.1)
    _, g_lazy = make_phase_fns(config_l, models_l)
    new_l, m_l = jax.jit(g_lazy)(state_l, batches, rng, p)

    config_p, models_p, state_p = _setup(path_interval=1, path_lambda=0.2)
    _, g_plain = make_phase_fns(config_p, models_p)
    new_p, m_p = jax.jit(g_plain)(state_p, batches, rng, p)

    np.testing.assert_allclose(
        np.asarray(m_l["path_loss"]), np.asarray(m_p["path_loss"]),
        rtol=1e-6, atol=1e-8,
    )
    for k in ("total_gen_loss", "gan_loss", "reconstruction_loss",
              "identity_loss", "kl_loss", "style_loss"):
        np.testing.assert_allclose(
            np.asarray(m_l[k]), np.asarray(m_p[k]), rtol=1e-6, atol=1e-7,
            err_msg=k,
        )
    _params_close(new_l, new_p)


def test_off_interval_matches_split_with_zero_lambda():
    """Step 1 with interval=2 == g_loss_split with λ_path = 0."""
    batches = _batches()
    rng = jax.random.key(5)
    p = jnp.zeros(())

    config_l, models_l, state_l = _setup(path_interval=2, path_lambda=0.1)
    state_l = state_l.replace(step=jnp.ones((), jnp.int32))
    _, g_lazy = make_phase_fns(config_l, models_l)
    new_l, m_l = jax.jit(g_lazy)(state_l, batches, rng, p)

    config_s, models_s, state_s = _setup(g_loss_split=True, path_lambda=0.0)
    state_s = state_s.replace(step=jnp.ones((), jnp.int32))
    _, g_split = make_phase_fns(config_s, models_s)
    new_s, m_s = jax.jit(g_split)(state_s, batches, rng, p)

    assert float(m_l["path_loss"]) == 0.0  # skipped, reported as zero
    for k in ("total_gen_loss", "gan_loss", "reconstruction_loss",
              "identity_loss", "kl_loss", "style_loss"):
        np.testing.assert_allclose(
            np.asarray(m_l[k]), np.asarray(m_s[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
    _params_close(new_l, new_s)


def test_cadence_follows_global_step_in_fused_loop():
    """Four fused steps at interval=3: path fires at steps 0 and 3 only."""
    config, models, state = _setup(path_interval=3)
    step_fn = jax.jit(make_train_step(config, models))
    batches = _batches()
    fired = []
    for i in range(4):
        state, metrics = step_fn(state, batches, jax.random.fold_in(jax.random.key(7), i))
        fired.append(float(metrics["path_loss"]) != 0.0)
    assert fired == [True, False, False, True]


def test_lazy_path_under_mesh_matches_single_device():
    """The cond'd path sub-backward shards like the straight-line program:
    metrics on a 4x2 mesh equal the single-device lazy step (on- and
    off-interval)."""
    from one_to_many_gan_tpu.parallel import make_mesh, replicate, shard_batch

    rng_np = np.random.default_rng(1)
    raw = [(rng_np.random((8, 32, 32, 1)) * 2 - 1).astype(np.float32)
           for _ in range(4)]
    outs = {}
    for use_mesh in (False, True):
        config = tiny_config(
            (32, 32), 8, min_latent=16, w_dim=6, n_resnet_blocks=3,
            tpu={"path_interval": 2,
                 "spatial_parallel": 2 if use_mesh else 1},
        )
        models = Models(config)
        state = init_train_state(config, models, jax.random.key(0))
        mesh = make_mesh(4, 2) if use_mesh else None
        if use_mesh:
            state = replicate(mesh, state)
            batches = Batches(*(shard_batch(mesh, r) for r in raw))
        else:
            batches = Batches(*(jnp.asarray(r) for r in raw))
        _, g_phase = make_phase_fns(config, models, mesh)
        jitted = jax.jit(g_phase)
        per_step = {}
        for step in (0, 1):  # on- and off-interval
            st = state.replace(step=jnp.asarray(step, jnp.int32))
            _, m = jitted(st, batches, jax.random.key(2), jnp.zeros(()))
            per_step[step] = {k: float(v) for k, v in m.items()}
        outs[use_mesh] = per_step
    for step in (0, 1):
        for k, v in outs[False][step].items():
            # spatial sharding reassociates the H-axis reductions inside
            # the loss means (measured ~3e-5 rel on path_loss at 4x2)
            np.testing.assert_allclose(
                outs[True][step][k], v, rtol=1e-4, atol=1e-6,
                err_msg=f"step {step} metric {k}",
            )
    assert outs[False][0]["path_loss"] > 0
    assert outs[False][1]["path_loss"] == 0.0


def test_lazy_path_composes_with_g_loss_split():
    """Both flags set: same lazy structure, still runs and skips."""
    batches = _batches()
    rng = jax.random.key(5)
    p = jnp.zeros(())
    config, models, state = _setup(path_interval=2, g_loss_split=True)
    _, g_phase = make_phase_fns(config, models)
    jitted = jax.jit(g_phase)
    _, m_on = jitted(state, batches, rng, p)
    _, m_off = jitted(state.replace(step=jnp.ones((), jnp.int32)), batches, rng, p)
    assert float(m_on["path_loss"]) > 0
    assert float(m_off["path_loss"]) == 0.0
