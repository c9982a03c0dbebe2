"""Primitive ops: equalized layers, modulated conv, resampling, norms."""

from one_to_many_gan_tpu.ops.equalized import EqualizedConv, EqualizedLinear
from one_to_many_gan_tpu.ops.modulated import ModulatedConv
from one_to_many_gan_tpu.ops.norm import instance_norm, l2_normalize
from one_to_many_gan_tpu.ops.quantize import (
    int8_conv,
    quantize_activations,
    quantize_weight,
)
from one_to_many_gan_tpu.ops.resample import (
    bilinear_resize,
    blur3,
    downsample2x,
    upsample2x,
)

__all__ = [
    "EqualizedConv",
    "EqualizedLinear",
    "ModulatedConv",
    "bilinear_resize",
    "blur3",
    "downsample2x",
    "instance_norm",
    "int8_conv",
    "l2_normalize",
    "quantize_activations",
    "quantize_weight",
    "upsample2x",
]
