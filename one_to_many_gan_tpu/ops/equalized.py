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
        if self.features == 1 and kh * kw > 1 and self.stride == 1:
            # Tap-basis formulation for single-output-channel convs. A
            # direct KxK Cin->1 conv pays the MXU's 128-lane output padding
            # on every spatial position (the generator's 7x7 -> 1 output
            # conv measured 1.5 effective TFLOPs / 13.5 ms at 3x batch —
            # ~8% of the whole train step; zero-padding the output channels
            # is folded away by XLA's slice(conv) simplifier). Instead:
            #   1) a 1x1 conv Cin -> kh*kw "tap" channels (dense MXU matmul
            #      with a well-utilized output dimension), then
            #   2) the KxK spatial accumulation as a sum of kh*kw statically
            #      shifted slices of the tap tensor (one fused VPU pass;
            #      each tap element is read exactly once).
            # Same multiplies as the direct conv, reassociated; f32 tap sum.
            w_taps = jnp.moveaxis(w_eff.reshape(kh * kw, in_features), 0, 1)
            z = jax.lax.conv_general_dilated(
                x,
                w_taps[None, None],  # [1,1,Cin,kh*kw]
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h_out = x.shape[1] - kh + 1
            w_out = x.shape[2] - kw + 1
            acc = jnp.zeros(
                (x.shape[0], h_out, w_out), jnp.float32
            )
            for t in range(kh * kw):
                ty, tx = divmod(t, kw)
                acc = acc + z[:, ty : ty + h_out, tx : tx + w_out, t].astype(
                    jnp.float32
                )
            y = acc[..., None].astype(self.dtype)
        else:
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
