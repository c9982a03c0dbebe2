"""Equalized-learning-rate primitives (Progressive GAN / StyleGAN2 style).

Behavioral contract (reference: src/model/layers.py:12-108): weights are
stored as N(0,1) and multiplied at use-time by the He constant
``1/sqrt(fan_in)``, so all parameters share the same effective learning-rate
scale under Adam.

TPU notes: parameters are stored float32; activations/compute may be
bfloat16 (``dtype`` attribute) — the weight scaling happens after the cast
so the He constant is applied in compute precision, keeping the matmul on
the MXU in bf16 when enabled.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name


def _pad2d(x: jax.Array, pad: int, mode: str) -> jax.Array:
    if pad == 0:
        return x
    cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if mode == "zero":
        return jnp.pad(x, cfg)
    if mode in ("reflect", "edge"):
        return jnp.pad(x, cfg, mode=mode)
    msg = f"unknown pad mode {mode}"
    raise ValueError(msg)


class EqualizedLinear(nn.Module):
    """Linear layer with equalized learning rate.

    ``bias_init`` mirrors the reference's constant bias initialisation
    (used with 1.0 by the modulated conv's style affine so that an all-zero
    style vector maps to unit modulation, layers.py:138-140).
    """

    features: int
    bias_init: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            nn.initializers.constant(self.bias_init),
            (self.features,),
            jnp.float32,
        )
        c = 1.0 / math.sqrt(in_features)
        x = x.astype(self.dtype)
        y = x @ (weight.astype(self.dtype) * c)
        return y + bias.astype(self.dtype)


class EqualizedConv(nn.Module):
    """2D convolution with equalized learning rate, NHWC.

    ``padding`` is an integer zero-pad by default; set ``pad_mode`` to
    "reflect" for the reference's external ReflectionPad2d + valid-conv
    pattern (collapsed into one op here).
    """

    features: int
    kernel_size: int | Sequence[int]
    padding: int = 0
    pad_mode: str = "zero"
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if isinstance(self.kernel_size, int):
            kh, kw = self.kernel_size, self.kernel_size
        else:
            kh, kw = self.kernel_size
        in_features = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (kh, kw, in_features, self.features),
            jnp.float32,
        )
        c = 1.0 / math.sqrt(in_features * kh * kw)
        w_eff = weight.astype(self.dtype) * c
        x = _pad2d(x.astype(self.dtype), self.padding, self.pad_mode)
        # NOTE on the Cout=1 output convs (generator/discriminator heads):
        # a KxK Cin->1 conv pays the MXU's 128-lane output padding, and two
        # restructurings were measured IN-STEP and rejected (see
        # BASELINE.md "round-2 negative results"): (a) zero-padding the
        # output channels to 8 is folded away by XLA's slice(conv)
        # simplifier; (b) a tap-basis rewrite (1x1 conv to k*k tap channels
        # + shifted-slice sum) wins in isolation but loses ~10 ms/step
        # in-step — the per-tap slice reads one lane of a 128-lane-padded
        # tile, wasting ~128x read bandwidth. XLA's fused direct conv is
        # the measured optimum here.
        y = jax.lax.conv_general_dilated(
            x,
            w_eff,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        # Named for the selective-remat policy (tpu.remat = "conv"): conv
        # outputs are the save points; everything between them (IN, ReLU,
        # pads, FIR resamples) is cheap to recompute in the backward.
        return checkpoint_name(y, "conv_out")
