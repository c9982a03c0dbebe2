"""Hard-fail FID comparability mode (VERDICT r3 #5).

``tpu.require_inception_fid=true`` must make validation raise when
InceptionV3 weights are unavailable, instead of silently logging a
relative-only random-projection FID; the default (false) keeps the
fallback. Reference protocol being guarded: clean-fid InceptionV3
(reference src/core/evaluation.py:64-69).
"""

import jax
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.metrics import inception as inception_mod
from one_to_many_gan_tpu.metrics.fid import (
    InceptionUnavailableError,
    default_extractor,
)
from tests.helpers import write_tiny_config


def test_config_default_is_off(tmp_path):
    config = load_config(write_tiny_config(tmp_path))
    assert config["tpu"]["require_inception_fid"] is False


def test_default_extractor_fallback_when_not_required(monkeypatch):
    monkeypatch.setattr(inception_mod, "try_load_inception", lambda: None)
    _, name = default_extractor(require_inception=False)
    assert name == "random_projection_v1"


def test_default_extractor_raises_when_required(monkeypatch):
    monkeypatch.setattr(inception_mod, "try_load_inception", lambda: None)
    with pytest.raises(InceptionUnavailableError, match="require_inception_fid"):
        default_extractor(require_inception=True)


def test_default_extractor_requires_and_gets_inception(monkeypatch):
    fake = lambda images: np.zeros((len(images), 4), np.float32)
    monkeypatch.setattr(inception_mod, "try_load_inception", lambda: fake)
    fn, name = default_extractor(require_inception=True)
    assert name == "inception_v3_pool3" and fn is fake


def test_val_checkpoint_hard_fails(tmp_path, monkeypatch):
    """End to end through val_checkpoint: generation succeeds, the FID stage
    raises BEFORE any misleading log line is written."""
    from one_to_many_gan_tpu.core.evaluation import val_checkpoint
    from one_to_many_gan_tpu.core.state import Models, init_train_state

    monkeypatch.setattr(inception_mod, "try_load_inception", lambda: None)
    config = load_config(
        write_tiny_config(
            tmp_path, tpu_section="\n[tpu]\nrequire_inception_fid = true\n"
        )
    )
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    rng = np.random.default_rng(1)

    def iters():
        while True:
            yield (rng.random((4, 32, 32, 1)) * 2 - 1).astype(np.float32)

    reals = (rng.random((8, 32, 32, 1)) * 255).astype(np.uint8)
    with pytest.raises(InceptionUnavailableError):
        val_checkpoint(
            0, config, models, state, iters(), jax.random.key(2),
            real_images=reals,
        )
    run_dir = config["training"]["checkpoint_directory"] / "test_run"
    assert not (run_dir / "metrics.jsonl").exists()  # nothing misleading logged
