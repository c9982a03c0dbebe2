"""Dynamic int8 quantized convolution (inference-only serving path).

New TPU capability with no reference analogue (the reference serves
nothing; its closest inference surface is the eval decode,
src/core/evaluation.py:171-177). The v5e MXU runs int8 x int8 -> int32
at twice the bf16 peak (394.7 vs 197.4 TOPS) — that was the motivation,
but the MEASURED end-to-end speedup on the 256² b16 serving decode is
only **1.03x** (BASELINE.md round 4): at that shape the decode chain is
bandwidth/dispatch-bound, not MXU-bound (the 64-channel levels pay lane
padding). Keep this path as an opt-in for genuinely MXU-bound shapes;
do not expect 2x at the default serving shapes.

Scheme (symmetric, zero-point-free — the MXU path needs no zero-point
correction term):

- weights: per-OUTPUT-channel scale ``w_scale[o] = max|W[..., o]| / 127``,
  ``W_q = round(W / w_scale)`` in [-127, 127]. Computed from the f32
  params at trace time inside jit; the cost is one elementwise pass over
  the (small) weight tensor per call, invisible next to the conv itself.
- activations: per-SAMPLE scale ``x_scale[b] = max|x[b]| / 127`` computed
  dynamically (a GAN decode's activation range varies strongly with the
  style vector, so static calibration would either clip or waste range).
- ``y = conv_int8(X_q, W_q) * (x_scale[b] * w_scale[o])`` — int32
  accumulation, exact dequantization as a per-(batch, out-channel)
  rescale, the same broadcast shape the modulated conv's demodulation
  already applies (ops/modulated.py).

``round`` has no useful gradient; nothing on the training path may call
this (core/train_step.py rejects int8-configured models).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns ``(w_q int8 [kh,kw,I,O], w_scale f32 [O])`` with
    ``w_q * w_scale ~= w``.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    w_q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return w_q, scale


def quantize_activations(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample symmetric int8 quantization of an NHWC batch.

    Returns ``(x_q int8, x_scale f32 [B])`` with ``x_q * x_scale ~= x``.
    """
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3))
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    x_q = jnp.clip(
        jnp.round(x / scale[:, None, None, None]), -_QMAX, _QMAX
    ).astype(jnp.int8)
    return x_q, scale


def int8_conv(
    x: jax.Array, w: jax.Array, stride: int = 1
) -> jax.Array:
    """VALID NHWC conv computed on the int8 MXU path, result float32.

    ``x`` [B,Hp,Wp,I] (already padded), ``w`` [kh,kw,I,O] float32 effective
    weights (equalized-LR constant already applied). Quantization error is
    bounded by the two dynamic scales; see tests/test_int8.py for the
    exactness construction (integer-valued inputs round-trip bit-exactly).
    """
    x_q, x_scale = quantize_activations(x)
    w_q, w_scale = quantize_weight(w)
    y32 = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y32.astype(jnp.float32) * (
        x_scale[:, None, None, None] * w_scale[None, None, None, :]
    )
