"""Config-system tests: reference-schema loading, [tpu] defaults, validation."""

import shutil
from pathlib import Path

import pytest

from one_to_many_gan_tpu.config import load_config, n_downsamples
from tests.helpers import write_tiny_config

REFERENCE_CONFIG = Path("/root/reference/config.toml")


def test_tiny_config_loads(tmp_path):
    config = load_config(write_tiny_config(tmp_path))
    assert config["training"]["batch_size"] == 2
    assert isinstance(config["training"]["checkpoint_directory"], Path)
    assert isinstance(config["data"]["shoeprint_data_dir"], Path)
    assert config["optimisation"]["adam_betas"] == [0.5, 0.99]


def test_reference_config_loads_unchanged(tmp_path):
    """The reference's own config.toml is a valid input (public API)."""
    if not REFERENCE_CONFIG.exists():
        pytest.skip("reference not mounted")
    path = tmp_path / "ref.toml"
    shutil.copy(REFERENCE_CONFIG, path)
    config = load_config(path)
    assert config["training"]["training_steps"] == 150_000
    assert config["architecture"]["w_dim"] == 6
    assert tuple(config["data"]["image_size"]) == (512, 256)
    # [tpu] section absent -> defaults
    assert config["tpu"]["precision"] == "float32"
    assert config["tpu"]["resume"] is True


def test_tpu_section_overrides(tmp_path):
    config = load_config(
        write_tiny_config(
            tmp_path, tpu_section='\n[tpu]\nprecision = "bfloat16"\nema_decay = 0.99\n'
        )
    )
    assert config["tpu"]["precision"] == "bfloat16"
    assert config["tpu"]["ema_decay"] == 0.99
    assert config["tpu"]["data_parallel"] == -1  # untouched default


def test_validation_rejects_bad_granularity(tmp_path):
    path = write_tiny_config(tmp_path)
    text = path.read_text().replace(
        "path_loss_jacobian_granularity = [0.1, 0.2]",
        "path_loss_jacobian_granularity = [0.3, 0.2]",
    )
    path.write_text(text)
    with pytest.raises(ValueError, match="granularity"):
        load_config(path)


def test_validation_rejects_bad_precision(tmp_path):
    with pytest.raises(ValueError, match="precision"):
        load_config(
            write_tiny_config(tmp_path, tpu_section='\n[tpu]\nprecision = "fp8"\n')
        )


def test_n_downsamples(tmp_path):
    config = load_config(write_tiny_config(tmp_path))
    # 32x32 image, min latent 16 -> 1
    assert n_downsamples(config) == 1


def test_shipped_configs_validate():
    """Every config shipped under configs/ loads through the validator —
    catches knob typos at edit time (e.g. the round-5 path_interval
    additions) rather than at TPU-run time."""
    shipped = sorted((Path(__file__).parent.parent / "configs").glob("*.toml"))
    assert shipped, "no shipped configs found"
    for path in shipped:
        config = load_config(path)
        assert config["tpu"]["path_interval"] >= 1, path
    flagship = load_config(
        Path(__file__).parent.parent / "configs" / "tpu_v5e8_512.toml"
    )
    # the documented 512² operating point (BASELINE.md round-5)
    assert flagship["tpu"]["path_interval"] == 8
    assert flagship["tpu"]["split_phases"] is True
    assert flagship["tpu"]["remat"] == "none"
