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


def s2d_pack_eligible(xp: jax.Array, kh: int, kw: int, stride: int) -> bool:
    """Shape gate for the space-to-depth-packed 3x3 conv (below).

    Only the low-channel, large-spatial levels win: the MXU runs
    3x3@<=128ch convs at 256²+ well below peak (channel lane padding,
    BASELINE.md probe table: 50-66 TFLOPs vs 109-131 at deeper levels),
    while the packed 2x2@4C equivalent runs ~122-131 — more than the
    16/9 FLOP inflation. ``xp`` is the already-padded input.
    """
    return (
        kh == 3
        and kw == 3
        and stride == 1
        and xp.shape[-1] <= 128
        and min(xp.shape[1], xp.shape[2]) >= 200
        and xp.shape[1] % 2 == 0
        and xp.shape[2] % 2 == 0
    )


def conv3x3_s2d_packed(xp: jax.Array, w: jax.Array) -> jax.Array:
    """VALID 3x3 stride-1 conv computed as a 2x space-to-depth-packed
    2x2 conv (exact to float reassociation).

    ``xp`` [B,Hp,Wp,C] is the padded input (Hp, Wp even); ``w``
    [3,3,C,O]. Output equals ``conv_general_dilated(xp, w, VALID)``:
    [B,Hp-2,Wp-2,O].

    Formulation: the 3x3 kernel is embedded at each of the 4 subpixel
    offsets of ONE 4x4 stride-2 kernel with 4O output channels (one O
    group per output subpixel), followed by depth-to-space — the proven
    ``s2d_out`` trick generalized to O > 1. The input needs NO
    space-to-depth relayout (an explicit input repack was measured at
    -19% in-step, BASELINE.md round-3 rejections); the output d2s
    reshape is the same cheap pattern the head conv already uses. MACs
    inflate 16/9, but the MXU matmul shape (K-dim 16C vs 9C, M /4)
    matches the measured-fast packed shape (BASELINE.md probe table).
    """
    b, hp, wp, cin = xp.shape
    o = w.shape[-1]
    ws = jnp.zeros((4, 4, cin, 4 * o), w.dtype)
    for pi in range(2):
        for pj in range(2):
            ws = ws.at[
                pi : pi + 3, pj : pj + 3, :, (pi * 2 + pj) * o : (pi * 2 + pj + 1) * o
            ].set(w)
    yq = jax.lax.conv_general_dilated(
        xp,
        ws,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, Hp/2 - 1, Wp/2 - 1, 4O]
    h2, w2 = hp // 2 - 1, wp // 2 - 1
    return (
        yq.reshape(b, h2, w2, 2, 2, o)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, 2 * h2, 2 * w2, o)
    )


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
    # Output space-to-depth subpixel factor for Cout=1 convs (see below);
    # 0 disables. MUST be 0 when the spatial axes are device-sharded: the
    # strided-conv + depth-to-space chain partitions INCORRECTLY under
    # XLA SPMD H-sharding (measured wrong, not just reassociated —
    # Models(config) handles this automatically from tpu.spatial_parallel).
    s2d_out: int = 8
    # Input space-to-depth packing for eligible 3x3 convs
    # (conv3x3_s2d_packed; tpu.s2d_pack via Models). Same H-sharding
    # caveat as s2d_out.
    s2d_in: bool = False

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
        # a KxK Cin->1 conv pays the MXU's 128-lane output padding. Two
        # restructurings were measured IN-STEP and rejected (BASELINE.md
        # "round-2 negative results"): zero-padding the output channels is
        # folded away by XLA's slice(conv) simplifier, and a tap-basis
        # rewrite (1x1 conv + shifted-slice sum) loses ~10 ms/step to
        # 128x lane-waste in the per-tap slice reads. The formulation that
        # DOES win is the output space-to-depth below. The OTM_S2D_OUTCONV
        # override is resolved ONCE at Models(config) build time
        # (core/state.py) — traced programs stay a pure function of module
        # attributes (ambient-env reads at trace time can disagree with
        # the sharding guard and poison persistent-compilation-cache keys).
        sub = self.s2d_out
        h_out = x.shape[1] - kh + 1
        w_out = x.shape[2] - kw + 1
        s2d = (
            sub >= 2
            and self.features == 1
            and self.stride == 1
            and kh == kw
            and h_out % sub == 0
            and w_out % sub == 0
            and (x.shape[1] - (kh + sub - 1)) % sub == 0
            and (x.shape[2] - (kw + sub - 1)) % sub == 0
        )
        if s2d:
            # Output space-to-depth: one (K+S-1)^2 stride-S conv with S^2
            # subpixel output channels (the KxK kernel embedded at the S^2
            # offsets), then depth-to-space. Same multiplies on 1/S^2 the
            # spatial positions -> S^2 less padded-MXU output work (the
            # 128-lane Cout padding is paid either way); stays a single
            # conv so XLA's fusion structure is untouched. Measured
            # in-step at 256^2/b16 (BASELINE.md): S=2 +2.3%, S=4 +5.0%,
            # S=8 +6.0% end-to-end (the default; S=16 would split the
            # 256 output channels across two 128-lane groups). Exact to
            # f32 reassociation; OTM_S2D_OUTCONV=0 restores the direct
            # conv.
            ws = jnp.zeros(
                (kh + sub - 1, kw + sub - 1, in_features, sub * sub), self.dtype
            )
            for di in range(sub):
                for dj in range(sub):
                    ws = ws.at[di : di + kh, dj : dj + kw, :, di * sub + dj].set(
                        w_eff[..., 0]
                    )
            ysub = jax.lax.conv_general_dilated(
                x,
                ws,
                window_strides=(sub, sub),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b_, hh, wh, _ = ysub.shape
            y = (
                ysub.reshape(b_, hh, wh, sub, sub)
                .transpose(0, 1, 3, 2, 4)
                .reshape(b_, hh * sub, wh * sub, 1)
            )
        elif self.s2d_in and s2d_pack_eligible(x, kh, kw, self.stride):
            y = conv3x3_s2d_packed(x, w_eff)
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
