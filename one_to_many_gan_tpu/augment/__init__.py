"""Adaptive discriminator augmentation: pipeline + probability controller."""

from one_to_many_gan_tpu.augment.controller import (
    AdaState,
    init_ada_state,
    make_ada_update,
)
from one_to_many_gan_tpu.augment.pipeline import ALL_CATEGORIES, augment

__all__ = [
    "ALL_CATEGORIES",
    "AdaState",
    "augment",
    "init_ada_state",
    "make_ada_update",
]
