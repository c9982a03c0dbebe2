"""StyleGAN2 weight-modulated convolution, TPU-native formulation.

Behavioral contract (reference: src/model/layers.py:111-188): per-sample
style ``s = affine(w)`` scales the conv weights per input channel; the
scaled weights are demodulated by ``rsqrt(sum(w^2) + eps)`` over
(in, kh, kw); the reference then materializes a ``[B*O, I, k, k]`` weight
tensor and runs a grouped conv with ``groups = B``.

That grouped-conv pattern is hostile to the TPU MXU (tiny per-group
matmuls, B-times weight traffic). Because convolution is linear in the
weights, the identical math factorizes as:

    y[b, :, :, o] = conv(x[b] * s[b, :], W)[..., o] * d[b, o]
    d[b, o]       = rsqrt( sum_i s[b,i]^2 * sum_kk W[o,i,kk]^2 + eps )

i.e. scale the *activations* per (batch, in-channel), run ONE ordinary
batched convolution (large MXU matmuls, weights loaded once), and rescale
the output per (batch, out-channel). This is StyleGAN2's own
``fused=False`` identity. The demodulation factor is computed exactly as
the reference does — including the equalized-LR constant inside the square
— so results match bit-for-bit up to float reassociation.

Demodulation statistics are kept in float32 even under a bf16 activation
policy.

Inference-only int8 path (``int8=True``; new TPU capability, no reference
analogue): the activation-scaling factorization makes the conv's weights
STATIC (the per-sample style lives entirely in the activation scale and
the demodulation rescale), so the weights quantize offline-style —
symmetric per-output-channel int8 — and the modulated activations
quantize dynamically per sample. The convolution then runs int8 x int8
with int32 accumulation, which the v5e MXU executes at 2x the bf16 peak
(394 vs 197 TOPS), and the exact dequantization scale
``x_scale[b] * w_scale[o]`` folds into the existing per-(batch, out)
demodulation rescale. ``round`` has no gradient, so this path is for
serving/eval only — ``make_train_step`` rejects int8 models.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from one_to_many_gan_tpu.ops.equalized import (
    EqualizedLinear,
    _pad2d,
    conv3x3_s2d_packed,
    s2d_pack_eligible,
)
from one_to_many_gan_tpu.ops.quantize import int8_conv


class ModulatedConv(nn.Module):
    """Style-modulated 3x3 (or kxk) conv, NHWC, batched-MXU formulation.

    ``padding``/``pad_mode`` fold the reference's external ReflectionPad2d
    into the op (blocks.py:49-58 applies reflect-pad 1 then a valid conv;
    builder.py:193-195 uses zero padding 1).
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    pad_mode: str = "zero"
    demodulate: bool = True
    use_bias: bool = False
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32
    # Space-to-depth packing for eligible shapes (tpu.s2d_pack): the
    # modulation (per-in-channel activation scale) and demodulation
    # (per-out-channel rescale) both commute with the subpixel packing,
    # so the packed conv drops in unchanged (ops/equalized.py).
    s2d_in: bool = False
    # Inference-only int8 conv (module docstring). Takes precedence over
    # s2d_in; never enabled on the training path.
    int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, w_style: jax.Array) -> jax.Array:
        """Apply the modulated conv.

        Args:
            x: images/features, [B, H, W, in_features].
            w_style: style vectors, [B, w_dim].
        """
        k = self.kernel_size
        in_features = x.shape[-1]

        # Style affine with bias init 1 (zero style vector -> unit scale).
        s = EqualizedLinear(
            in_features, bias_init=1.0, dtype=jnp.float32, name="to_style"
        )(w_style.astype(jnp.float32))  # [B, in]

        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, in_features, self.features),
            jnp.float32,
        )
        c = 1.0 / math.sqrt(in_features * k * k)

        # Modulate: scale activations per (batch, in-channel).
        x = x.astype(self.dtype) * s[:, None, None, :].astype(self.dtype)
        x = _pad2d(x, self.padding, self.pad_mode)
        w_eff = weight.astype(self.dtype) * jnp.asarray(c, self.dtype)
        if self.int8:
            # params are stored f32; the equalized-LR constant folds into
            # the weight scale exactly (quantize.py)
            y = int8_conv(x, weight * c).astype(self.dtype)
        elif self.s2d_in and s2d_pack_eligible(x, k, k, 1):
            y = conv3x3_s2d_packed(x, w_eff)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w_eff,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.demodulate:
            # sum over (kh, kw) of the *equalized* weight squared: [in, out]
            wsq = jnp.sum(jnp.square(weight * c), axis=(0, 1))
            # [B, out] = s^2 @ wsq  (exactly sum_{i,kh,kw} (c*W*s)^2)
            denom = jnp.square(s) @ wsq + self.eps
            d = jax.lax.rsqrt(denom)  # float32
            y = y * d[:, None, None, :].astype(self.dtype)

        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        # Save point for the tpu.remat = "conv" policy (see equalized.py).
        return checkpoint_name(y, "conv_out")
