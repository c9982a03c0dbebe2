"""Pallas TPU kernels for hot ops (flag-gated, with XLA fallbacks)."""

from one_to_many_gan_tpu.ops.pallas.instance_norm import (
    instance_norm_pallas,
    instance_norm_relu_pallas,
)
from one_to_many_gan_tpu.ops.pallas.warp import warp_pallas

__all__ = ["instance_norm_pallas", "instance_norm_relu_pallas", "warp_pallas"]
