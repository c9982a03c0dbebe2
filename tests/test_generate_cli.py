"""End-to-end test of the 1->N generation CLI against a trained checkpoint."""

import numpy as np

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.trainer import Trainer
from one_to_many_gan_tpu.data import synthetic_images, write_synthetic_dataset_dirs
from one_to_many_gan_tpu.generate import generate
from tests.helpers import write_tiny_config


def test_generate_from_checkpoint(tmp_path):
    config_path = write_tiny_config(tmp_path, training_steps=3, checkpoint_interval=3)
    config = load_config(config_path)
    trainer = Trainer(
        config,
        shoeprint_images=synthetic_images(8, (32, 32), seed=0),
        shoemark_images=synthetic_images(8, (32, 32), seed=1),
        verbose=False,
    )
    trainer.run()

    src_root = write_synthetic_dataset_dirs(
        tmp_path / "src", n_train=1, n_test=1, image_size=(32, 32)
    )
    source = next((src_root / "train").glob("*.png"))
    paths = generate(
        str(config_path), str(source), n=5, out_dir=str(tmp_path / "gen"), seed=3
    )
    assert len(paths) == 5
    from PIL import Image

    imgs = np.stack([np.asarray(Image.open(p)) for p in paths])
    assert imgs.shape == (5, 32, 32)
    # one-to-MANY: different styles give different outputs
    assert any(not np.array_equal(imgs[0], imgs[i]) for i in range(1, 5))

    # --theta is wired through: theta=0 zeroes the style (builder.py:87-90),
    # so every output of the sweep collapses to the SAME style-free decode
    # and differs from the theta=1 outputs.
    paths0 = generate(
        str(config_path), str(source), n=3, out_dir=str(tmp_path / "gen0"),
        seed=3, theta=0.0,
    )
    imgs0 = np.stack([np.asarray(Image.open(p)) for p in paths0])
    assert np.array_equal(imgs0[0], imgs0[1])
    assert np.array_equal(imgs0[0], imgs0[2])
    assert not np.array_equal(imgs0[0], imgs[0])


def test_generate_from_artifact(tmp_path):
    """--artifact: the one-shot CLI consumes the same export.py npz the
    serving fleet deploys; outputs equal the checkpoint-backed path."""
    config_path = write_tiny_config(tmp_path, training_steps=3, checkpoint_interval=3)
    config = load_config(config_path)
    Trainer(
        config,
        shoeprint_images=synthetic_images(8, (32, 32), seed=0),
        shoemark_images=synthetic_images(8, (32, 32), seed=1),
        verbose=False,
    ).run()
    from one_to_many_gan_tpu.export import export_inference_artifact

    artifact = export_inference_artifact(config, tmp_path / "model.npz")

    src_root = write_synthetic_dataset_dirs(
        tmp_path / "src", n_train=1, n_test=1, image_size=(32, 32)
    )
    source = next((src_root / "train").glob("*.png"))
    from_ckpt = generate(
        str(config_path), str(source), n=4, out_dir=str(tmp_path / "a"), seed=5
    )
    from_art = generate(
        str(config_path), str(source), n=4, out_dir=str(tmp_path / "b"),
        seed=5, artifact=str(artifact),
    )
    from PIL import Image

    for p, q in zip(from_ckpt, from_art):
        np.testing.assert_array_equal(
            np.asarray(Image.open(p)), np.asarray(Image.open(q))
        )
