"""Data subsystem: eager datasets, synthetic data, batch pipeline."""

from one_to_many_gan_tpu.data.datasets import (
    ArrayDataset,
    ShoeDataset,
    synthetic_images,
    write_synthetic_dataset_dirs,
)
from one_to_many_gan_tpu.data.pipeline import BatchIterator, normalize_u8

__all__ = [
    "ArrayDataset",
    "BatchIterator",
    "ShoeDataset",
    "normalize_u8",
    "synthetic_images",
    "write_synthetic_dataset_dirs",
]
