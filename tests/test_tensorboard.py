"""Optional TensorBoard metric sink (VERDICT r3 #8).

Opt-in via ``tpu.tensorboard``: event files appear under the run
directory; the offline ``export_jsonl`` converter adapts an existing
``metrics.jsonl`` (training intervals + validation fid/kid records).
Default-off: no event directory, no tensorboard import.
"""

import json

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.trainer import Trainer
from one_to_many_gan_tpu.data import synthetic_images
from one_to_many_gan_tpu.utils.tensorboard import export_jsonl
from tests.helpers import write_tiny_config


def _event_files(d):
    return list(d.rglob("events.out.tfevents.*"))


def test_export_jsonl_writes_event_files(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    records = [
        {"step": 2, "disc_loss": 0.5, "total_gen_loss": 1.25},
        {"step": 4, "disc_loss": 0.4, "total_gen_loss": 1.1},
        {"step": 5, "fid": 0.9, "kid": 0.01, "fid_extractor": "random_projection_v1"},
    ]
    jsonl.write_text("".join(json.dumps(r) + "\n" for r in records))
    n = export_jsonl(jsonl, tmp_path / "tb")
    assert n == 3
    events = _event_files(tmp_path / "tb")
    assert events and events[0].stat().st_size > 0

    # the scalar series round-trip (proves real event records, not a stub)
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/disc_loss", "train/total_gen_loss", "val/fid", "val/kid"} <= tags
    fid_events = acc.Scalars("val/fid")
    assert fid_events[0].step == 5 and abs(fid_events[0].value - 0.9) < 1e-6


def test_trainer_writes_events_when_enabled(tmp_path):
    config = load_config(
        write_tiny_config(tmp_path, tpu_section="\n[tpu]\ntensorboard = true\n")
    )
    config["training"]["training_steps"] = 2
    config["evaluation"]["checkpoint_interval"] = 2
    trainer = Trainer(
        config,
        shoeprint_images=synthetic_images(8, (32, 32), seed=0),
        shoemark_images=synthetic_images(8, (32, 32), seed=1),
        verbose=False,
    )
    trainer.run()
    run_dir = config["training"]["checkpoint_directory"] / "test_run"
    assert _event_files(run_dir / "tensorboard")


def test_trainer_default_off(tmp_path):
    config = load_config(write_tiny_config(tmp_path))
    assert config["tpu"]["tensorboard"] is False
    config["training"]["training_steps"] = 2
    config["evaluation"]["checkpoint_interval"] = 2
    trainer = Trainer(
        config,
        shoeprint_images=synthetic_images(8, (32, 32), seed=0),
        shoemark_images=synthetic_images(8, (32, 32), seed=1),
        verbose=False,
    )
    trainer.run()
    run_dir = config["training"]["checkpoint_directory"] / "test_run"
    assert not (run_dir / "tensorboard").exists()
