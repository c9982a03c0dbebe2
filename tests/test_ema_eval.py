"""EMA generator consumption in evaluation (VERDICT r2 #3).

The EMA weights exist FOR evaluation: when tpu.ema_decay > 0, FID/KID
validation, the image grids, and the generate CLI must all sample from
``state.ema_params_g`` — not the raw optimizer iterates — while the
non-EMA path stays byte-identical to before.
"""

import jax
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.evaluation import image_checkpoint, val_checkpoint
from one_to_many_gan_tpu.core.state import (
    Models,
    eval_params_g,
    init_train_state,
)
from tests.helpers import write_tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ema")
    config = load_config(
        write_tiny_config(tmp, tpu_section="\n[tpu]\nema_decay = 0.99\n")
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    # Make the EMA weights VISIBLY different from the live weights.
    perturbed = jax.tree.map(lambda x: x + 0.25, state.params_g)
    state_ema = state.replace(ema_params_g=perturbed)
    # Same weights installed as the LIVE params with EMA off: the ground
    # truth for "eval used the EMA weights".
    state_live = state.replace(params_g=perturbed, ema_params_g=None)
    return tmp, config, models, state, state_ema, state_live


def _iters(batch=4, seed=3):
    rng = np.random.default_rng(seed)

    def stream():
        while True:
            yield (rng.random((batch, 32, 32, 1)) * 2 - 1).astype(np.float32)

    return stream()


def test_eval_params_g_selects_ema(setup):
    _, _, _, state, state_ema, state_live = setup
    assert eval_params_g(state) is state.ema_params_g  # ema enabled
    assert eval_params_g(state_ema) is state_ema.ema_params_g
    assert eval_params_g(state_live) is state_live.params_g


def test_image_checkpoint_uses_ema_weights(setup):
    tmp, config, models, _, state_ema, state_live = setup
    import copy

    outs = {}
    for name, st in (("ema", state_ema), ("live", state_live)):
        cfg = copy.deepcopy(config)
        cfg["training"]["training_run"] = f"grid_{name}"
        image_checkpoint(
            0, cfg, models, st, _iters(seed=3), _iters(seed=4), jax.random.key(1)
        )
        run_dir = cfg["training"]["checkpoint_directory"] / f"grid_{name}"
        outs[name] = (run_dir / "images" / "translation_1.png").read_bytes()
    # EMA state and "EMA weights installed live" must render the SAME grid.
    assert outs["ema"] == outs["live"]


def test_val_checkpoint_uses_ema_weights(setup):
    tmp, config, models, state, state_ema, state_live = setup
    import copy

    fids = {}
    reals = (np.random.default_rng(9).random((8, 32, 32, 1)) * 255).astype(
        np.uint8
    )
    for name, st in (
        ("ema", state_ema),
        ("live", state_live),
        ("base", state.replace(ema_params_g=None)),
    ):
        cfg = copy.deepcopy(config)
        cfg["training"]["training_run"] = f"val_{name}"
        fid, _ = val_checkpoint(
            0,
            cfg,
            models,
            st,
            _iters(seed=5),
            jax.random.key(2),
            real_images=reals,
        )
        fids[name] = fid
    # FID from the EMA state equals FID with those weights installed live…
    assert fids["ema"] == pytest.approx(fids["live"], rel=1e-6)
    # …and differs from the un-perturbed base weights (EMA actually used).
    assert fids["ema"] != pytest.approx(fids["base"], rel=1e-3)
