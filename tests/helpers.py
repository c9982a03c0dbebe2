"""Shared test fixtures: a tiny but complete config."""

from pathlib import Path

TINY_TOML = """
[training]
batch_size = 2
random_seed = 42
training_steps = 6
image_buffer_size = 4
style_mixing_prob = 0.9
deterministic_cuda_kernels = false
gpu_number = 0
checkpoint_directory = "{ckpt_dir}"
training_run = "test_run"

[optimisation]
style_cycle_loss_lambda = 5.0
identity_loss_lambda = 5.0
reconstruction_loss_lambda = 5.0
kl_loss_lambda = 0.01
path_loss_lambda = 0.1
path_loss_jacobian_granularity = [0.1, 0.2]
learning_rate = 2e-3
mapping_network_learning_rate = 2e-5
adam_betas = [0.5, 0.99]

[ada]
discriminator_real_acc_target = 0.6
ada_overfitting_measurement_n_images = 8
ada_adjustment_size = 5.12e-4

[evaluation]
log_interval = 2
checkpoint_interval = 3
n_evaluation_images = 8
inference_batch_size = 4

[architecture]
w_dim = 6
add_latent_noise = false
min_latent_resolution = 16
n_resnet_blocks = 3
mapping_network_layers = 2

[data]
image_size = [32, 32]
image_channels = 1
shoemark_data_dir = "{shoemark_dir}"
shoeprint_data_dir = "{shoeprint_dir}"
{tpu_section}
"""


def write_tiny_config(
    tmp_path: Path,
    tpu_section: str = "",
    **overrides,
) -> Path:
    """Write a tiny complete config TOML and return its path."""
    text = TINY_TOML.format(
        ckpt_dir=tmp_path / "checkpoints",
        shoemark_dir=tmp_path / "shoemarks",
        shoeprint_dir=tmp_path / "shoeprints",
        tpu_section=tpu_section,
    )
    for key, value in overrides.items():
        # naive single-key override: replace the "key = ..." line
        import re

        text = re.sub(rf"(?m)^{key} = .*$", f"{key} = {value}", text)
    path = tmp_path / "config.toml"
    path.write_text(text)
    return path
