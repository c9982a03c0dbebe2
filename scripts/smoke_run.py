"""CPU smoke run: synthetic data + the cpu_smoke config, end to end.

Establishes the empirical baseline row described in BASELINE.md (the
reference publishes no numbers): asserts finite losses and prints the
final log line plus achieved it/s.

Runs on the live backend (the TPU in this image). ``OTM_SMOKE_CPU=1``
forces the CPU backend — the env var route (JAX_PLATFORMS) is
force-overridden by this image's axon plugin, so the config API is the
only way (CLAUDE.md), and it keeps the smoke path usable when the TPU
tunnel is down.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("OTM_SMOKE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.trainer import Trainer
from one_to_many_gan_tpu.data import write_synthetic_dataset_dirs


def main(config_path: str = "configs/cpu_smoke.toml") -> None:
    config = load_config(config_path)
    h, w = config["data"]["image_size"]
    for key in ("shoemark_data_dir", "shoeprint_data_dir"):
        root = Path(config["data"][key])
        if not (root / "train").exists():
            write_synthetic_dataset_dirs(
                root, n_train=32, n_test=8, image_size=(h, w),
                seed=hash(key) % 1000,
            )
    trainer = Trainer(config)
    trainer.run()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "configs/cpu_smoke.toml")
