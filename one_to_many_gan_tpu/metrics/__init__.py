"""Evaluation metrics: FID / KID with pluggable feature extractors."""

from one_to_many_gan_tpu.metrics.fid import (
    compute_fid,
    compute_kid,
    compute_stats,
    default_extractor,
    frechet_distance,
    kernel_distance,
    random_projection_extractor,
)

__all__ = [
    "compute_fid",
    "compute_kid",
    "compute_stats",
    "default_extractor",
    "frechet_distance",
    "kernel_distance",
    "random_projection_extractor",
]
