"""CLI entry point: ``python train.py [config.toml]``.

Same invocation contract as the reference (train.py:322-326), running the
TPU-native trainer. With ``tpu.resume = true`` (default) a crash-restart
continues from the latest Orbax checkpoint instead of step 0.

Exit codes: 0 success; 42 = TrainingDiverged (non-finite metrics,
tpu.halt_on_nonfinite) — a DETERMINISTIC failure that a blind resume
would replay identically, so scripts/infinite_run.sh stops instead of
hot-looping on it.
"""

import sys

DIVERGED_EXIT_CODE = 42


def main(config_path: str) -> None:
    from one_to_many_gan_tpu.config import load_config
    from one_to_many_gan_tpu.core.trainer import TrainingDiverged, train
    from one_to_many_gan_tpu.parallel import distributed

    # Multi-host pods: one process per host; discovers the coordinator
    # from the environment. No-op single-process. Validated end-to-end by
    # tests/test_multihost.py (two coordinated processes, real step).
    distributed.ensure_initialized()
    try:
        train(load_config(config_path))
    except TrainingDiverged as exc:
        print(f"TrainingDiverged: {exc}", file=sys.stderr)
        sys.exit(DIVERGED_EXIT_CODE)


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] == "":
        main("config.toml")
    else:
        main(sys.argv[1])
