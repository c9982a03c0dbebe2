"""Multi-step inner loop (lax.scan of K fused steps) equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.core.train_step import (
    Batches,
    make_multi_step,
    make_train_step,
)
from tests.helpers import write_tiny_config


def test_multi_step_matches_sequential(tmp_path):
    config = load_config(write_tiny_config(tmp_path))
    models = Models(config)
    state0 = init_train_state(config, models, jax.random.key(0))

    h, w = config["data"]["image_size"]
    b = config["training"]["batch_size"]
    rng = np.random.default_rng(0)
    k = 3
    batch_list = [
        Batches(
            *(jnp.asarray((rng.random((b, h, w, 1)) * 2 - 1).astype(np.float32))
              for _ in range(4))
        )
        for _ in range(k)
    ]
    keys = [jax.random.fold_in(jax.random.key(7), i) for i in range(k)]

    # sequential
    step = jax.jit(make_train_step(config, models))
    s_seq = state0
    seq_metrics = []
    for i in range(k):
        s_seq, m = step(s_seq, batch_list[i], keys[i])
        seq_metrics.append(m)

    # scanned
    multi = jax.jit(make_multi_step(config, models, k))
    stacked = Batches(
        *(jnp.stack([getattr(bl, f) for bl in batch_list]) for f in Batches._fields)
    )
    s_multi, m_multi = multi(state0, stacked, jnp.stack(keys))

    # step 0 runs on identical params -> tight match. Step 1 sees one
    # update's worth of cross-program rounding (measured 8e-6 worst rel
    # diff; bound 1e-4 leaves 10x headroom while still catching any
    # RNG/batch threading off-by-one, which would diverge at O(1)).
    # Step >=2 compounds through Adam's normalized updates (a 1-ulp grad
    # difference moves a param by ~lr), so only a loose bound is
    # meaningful there.
    for i in range(k):
        rtol = {0: 1e-5, 1: 1e-4}.get(i, 0.05)
        atol = {0: 1e-6, 1: 1e-5}.get(i, 2e-3)
        for name in seq_metrics[i]:
            np.testing.assert_allclose(
                float(seq_metrics[i][name]),
                float(m_multi[name][i]),
                rtol=rtol,
                atol=atol,
                err_msg=f"step {i} metric {name}",
            )
    # scan body and standalone step compile separately -> different fusion
    # and float reassociation; bound by a few Adam steps' magnitude
    lr = config["optimisation"]["learning_rate"]
    for a, bb in zip(
        jax.tree.leaves(s_seq.params_g), jax.tree.leaves(s_multi.params_g),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-2, atol=3 * k * lr
        )
    assert int(s_multi.step) == k


def test_trainer_clamps_steps_per_call(tmp_path):
    from one_to_many_gan_tpu.core.trainer import Trainer
    from one_to_many_gan_tpu.data import synthetic_images

    config = load_config(
        write_tiny_config(tmp_path, tpu_section="\n[tpu]\nsteps_per_call = 4\n")
    )
    # log_interval=2, ckpt_interval=3 -> gcd with 4 is 1
    tr = Trainer(
        config,
        shoeprint_images=synthetic_images(8, (32, 32), seed=0),
        shoemark_images=synthetic_images(8, (32, 32), seed=1),
        verbose=False,
    )
    assert tr.steps_per_call == 1


def test_trainer_runs_with_inner_loop(tmp_path):
    from one_to_many_gan_tpu.core.trainer import Trainer
    from one_to_many_gan_tpu.data import synthetic_images

    config = load_config(
        write_tiny_config(
            tmp_path,
            tpu_section="\n[tpu]\nsteps_per_call = 2\n",
            log_interval=2,
            checkpoint_interval=6,
        )
    )
    tr = Trainer(
        config,
        shoeprint_images=synthetic_images(8, (32, 32), seed=0),
        shoemark_images=synthetic_images(8, (32, 32), seed=1),
        verbose=False,
    )
    assert tr.steps_per_call == 2
    state = tr.run()
    assert int(state.step) == config["training"]["training_steps"]
    log = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
        / "log"
    ).read_text()
    assert len([ln for ln in log.splitlines() if ln.startswith("Step:")]) == 3
