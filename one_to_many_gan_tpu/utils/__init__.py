"""Utilities: profiling, timing, determinism helpers."""

from one_to_many_gan_tpu.utils.profiling import StepTimer, trace

__all__ = ["StepTimer", "trace"]
