"""End-to-end integration tests: config -> Trainer -> logs/checkpoints/resume."""

import re

import jax
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.trainer import (
    Trainer,
    TrainingDiverged,
    restore_checkpoint,
    save_checkpoint,
)
from one_to_many_gan_tpu.data import synthetic_images
from tests.helpers import write_tiny_config


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    config = load_config(write_tiny_config(tmp))
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config,
        shoeprint_images=prints,
        shoemark_images=marks,
        verbose=False,
    )
    state = trainer.run()
    return config, trainer, state, tmp


def test_runs_all_steps(run):
    config, trainer, state, _ = run
    assert int(state.step) == config["training"]["training_steps"]


def test_log_file_format(run):
    config, _, _, _ = run
    log = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
        / "log"
    ).read_text()
    lines = [ln for ln in log.splitlines() if ln.startswith("Step:")]
    assert len(lines) == 3  # 6 steps, log_interval 2
    pat = (
        r"Step: \d+/\d+, D loss: [-\d.e+]+, D real/fake acc: [-\d.e+]+/[-\d.e+]+, "
        r"Total G loss: [-\d.e+]+, Gan loss [-\d.e+]+, Idt loss [-\d.e+]+, "
        r"Rec loss [-\d.e+]+, KL loss [-\d.e+]+, Path loss [-\d.e+]+, "
        r"Style loss: [-\d.e+]+, ADA: [-\d.e+]+, "
    )
    assert re.fullmatch(pat, lines[0]), lines[0]
    fid_lines = [ln for ln in log.splitlines() if ln.startswith("Step ")]
    assert any("fid:" in ln and "kid:" in ln for ln in fid_lines)
    # structured sink mirrors the text log: one JSON object per interval
    import json

    jl = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
        / "metrics.jsonl"
    ).read_text()
    rows = [json.loads(ln) for ln in jl.splitlines()]
    train_rows = [r for r in rows if "total_disc_losses" in r]
    fid_rows = [r for r in rows if "fid" in r]
    assert len(train_rows) == 3
    assert {"step", "ada_ps"} <= set(train_rows[0])
    # FID rows carry the extractor tag (random-projection numbers must
    # never be mistaken for Inception FID)
    assert len(fid_rows) == 2  # checkpoints at steps 3 and 6
    assert all("fid_extractor" in r and "kid" in r for r in fid_rows)


def test_image_and_val_artifacts(run):
    config, _, _, _ = run
    run_dir = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
    )
    assert (run_dir / "images" / "translation_3.png").exists()
    assert (run_dir / "images" / "decoding_3.png").exists()
    assert (run_dir / "images" / "translation_6.png").exists()
    pngs = list((run_dir / "val").glob("*.png"))
    assert len(pngs) == config["evaluation"]["n_evaluation_images"]


def test_checkpoint_roundtrip_bitwise(run):
    config, trainer, state, _ = run
    restored, start = restore_checkpoint(trainer.ckpt_mgr, jax.tree.map(
        lambda x: x, state
    ))
    assert start == config["training"]["training_steps"]
    for a, b in zip(
        jax.tree.leaves(state), jax.tree.leaves(restored), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_not_restarts(run):
    """A fresh Trainer on the same run dir must resume at the latest step."""
    config, _, state, _ = run
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer2 = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    assert trainer2.start_step == config["training"]["training_steps"]
    for a, b in zip(
        jax.tree.leaves(state.params_g),
        jax.tree.leaves(trainer2.state.params_g),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_fast_forwards_data_stream(run):
    """A resumed Trainer continues the training data stream where an
    uninterrupted run would be, instead of replaying epoch 0 (the
    reference's infinite_run.sh restarts data from scratch)."""
    config, _, _, _ = run
    from one_to_many_gan_tpu.data import BatchIterator

    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer2 = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    assert trainer2.start_step == config["training"]["training_steps"]
    # An uninterrupted run consumed 2 batches per domain per step
    # (Trainer._next_batches_np); replay that consumption on fresh
    # iterators built with the Trainer's stream parameters.
    seed = config["training"]["random_seed"]
    batch = config["training"]["batch_size"]
    for it, images, offset in (
        (trainer2.shoeprint_iter, prints, 1),
        (trainer2.shoemark_iter, marks, 2),
    ):
        ref = BatchIterator(
            images, batch, shuffle=True, flip_prob=0.5, seed=seed + offset,
            as_float=False,
        )
        for _ in range(2 * trainer2.start_step):
            next(ref)
        np.testing.assert_array_equal(next(ref), next(it))


def _poison_summary(trainer):
    orig = trainer.logger.summary

    def poisoned(step):
        line, means = orig(step)
        means = dict(means)
        means["total_gen_losses"] = float("nan")
        return line, means

    trainer.logger.summary = poisoned


def test_halt_on_nonfinite_detects_divergence(tmp_path):
    """Failure detection (tpu.halt_on_nonfinite, default on): a non-finite
    interval mean raises TrainingDiverged at the log boundary, BEFORE the
    same-run checkpoint can persist the poisoned state."""
    config = load_config(write_tiny_config(tmp_path))
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    _poison_summary(trainer)
    with pytest.raises(TrainingDiverged, match="non-finite metrics"):
        trainer.run()  # first log boundary (step 2) precedes ckpt step 3
    assert trainer.ckpt_mgr.latest_step() is None


def test_halt_on_nonfinite_disabled_trains_through(tmp_path):
    config = load_config(
        write_tiny_config(
            tmp_path, tpu_section="\n[tpu]\nhalt_on_nonfinite = false\n"
        )
    )
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    _poison_summary(trainer)
    state = trainer.run(max_steps=2)  # reference behavior: no halt
    assert int(state.step) == 2


def test_pause_saves_model_only_checkpoint(tmp_path):
    """A max_steps-bounded pause that stops OFF the checkpoint cadence
    must still persist the state (model-only save, no FID/grids), so a
    later resume does not silently replay the unsaved steps."""
    config = load_config(write_tiny_config(tmp_path))
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    state = trainer.run(max_steps=2)  # ckpt_interval=3 -> step 2 off-cadence
    assert int(state.step) == 2
    # model-only: the state is checkpointed, but no eval artifacts exist
    run_dir = (
        config["training"]["checkpoint_directory"]
        / config["training"]["training_run"]
    )
    images_dir = run_dir / "images"
    assert not images_dir.exists() or not list(images_dir.glob("*.png"))
    trainer2 = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    assert trainer2.start_step == 2
    for a, b in zip(
        jax.tree.leaves(state), jax.tree.leaves(trainer2.state), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keep_checkpoints_retention(tmp_path):
    """tpu.keep_checkpoints bounds Orbax retention: with 1, only the
    newest model checkpoint survives a run that checkpoints twice."""
    config = load_config(
        write_tiny_config(tmp_path, tpu_section="\n[tpu]\nkeep_checkpoints = 1\n")
    )
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    trainer.run()  # 6 steps, ckpt_interval 3 -> checkpoints at 3 and 6
    assert trainer.ckpt_mgr.all_steps() == [6]


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """Preemption safety: SIGTERM mid-run stops at the next step boundary,
    persists a model-only checkpoint at that step, and a fresh Trainer
    resumes from it (the reference's restart loop loses everything since
    the last full checkpoint)."""
    import signal as _signal

    config = load_config(write_tiny_config(tmp_path))
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    calls = {"n": 0}
    orig = trainer.logger.append_metrics

    def tap(metrics):
        calls["n"] += 1
        if calls["n"] == 1:  # deliver SIGTERM during the first step
            _signal.raise_signal(_signal.SIGTERM)
        return orig(metrics)

    trainer.logger.append_metrics = tap
    state = trainer.run()
    assert int(state.step) == 1  # stopped at the first boundary (ckpt at 3)
    assert trainer.ckpt_mgr.latest_step() == 1
    trainer2 = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    assert trainer2.start_step == 1
    # the handler was restored after run()
    assert _signal.getsignal(_signal.SIGTERM) in (
        _signal.SIG_DFL,
        _signal.Handlers.SIG_DFL,
    )


def test_split_phases_trainer_runs(tmp_path):
    """tpu.split_phases end-to-end: two jitted programs per step, same
    loop contract (logs, checkpoints, resume metadata)."""
    config = load_config(
        write_tiny_config(
            tmp_path,
            tpu_section="\n[tpu]\nsplit_phases = true\nsteps_per_call = 4\n",
        )
    )
    prints = synthetic_images(8, (32, 32), seed=0)
    marks = synthetic_images(8, (32, 32), seed=1)
    trainer = Trainer(
        config, shoeprint_images=prints, shoemark_images=marks, verbose=False
    )
    assert trainer.steps_per_call == 1  # split forces K=1
    state = trainer.run(max_steps=2)
    assert int(state.step) == 2
