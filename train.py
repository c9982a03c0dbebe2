"""CLI entry point: ``python train.py [config.toml]``.

Same invocation contract as the reference (train.py:322-326), running the
TPU-native trainer. With ``tpu.resume = true`` (default) a crash-restart
continues from the latest Orbax checkpoint instead of step 0.
"""

import sys

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.trainer import train


def main(config_path: str) -> None:
    train(load_config(config_path))


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] == "":
        main("config.toml")
    else:
        main(sys.argv[1])
