"""int8 quantized inference path (ops/quantize.py, serve/generate --int8).

New TPU capability (no reference analogue): the decoder's modulated convs
run int8 x int8 on the MXU. Tests cover (a) bit-exactness of the
quantized conv on integer-representable inputs, (b) the error bound on
random inputs, (c) decode fidelity of the int8 generator vs the f32 one
on real (trained-shape) modules with a shared param tree, and (d) the
training-path guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_to_many_gan_tpu.config import load_config
from one_to_many_gan_tpu.core.state import Models, init_train_state
from one_to_many_gan_tpu.ops import int8_conv, quantize_activations, quantize_weight
from tests.helpers import write_tiny_config


def test_int8_conv_exact_on_integer_grids():
    """Integer-valued activations/weights with amax 127 quantize with zero
    error, so the int8 conv must equal the f32 conv bitwise."""
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, size=(3, 10, 10, 8)).astype(np.float32)
    x[0, 0, 0, 0] = 127.0  # pin per-sample amax to 127 -> scale exactly 1
    x[1, 0, 0, 0] = 127.0
    x[2, 0, 0, 0] = 127.0
    w = rng.integers(-127, 128, size=(3, 3, 8, 16)).astype(np.float32)
    w[0, 0, 0, :] = 127.0  # per-out-channel amax = 127 -> scale exactly 1
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w)))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_int8_conv_error_bound_random():
    """On random data the error is bounded by the quantization step: each
    of the K = kh*kw*I accumulated products carries at most
    (dx*|w| + dw*|x| + dx*dw) error with dx = x_scale/2, dw = w_scale/2."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 12, 12, 16)).astype(np.float32)
    w = rng.normal(size=(3, 3, 16, 32)).astype(np.float32) * 0.1
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w)))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    _, x_scale = quantize_activations(jnp.asarray(x))
    _, w_scale = quantize_weight(jnp.asarray(w))
    k = 3 * 3 * 16
    # worst-case per-product error, summed over the reduction
    bound = k * (
        float(x_scale.max()) / 2 * np.abs(w).max()
        + float(w_scale.max()) / 2 * np.abs(x).max()
        + float(x_scale.max()) * float(w_scale.max()) / 4
    )
    assert np.abs(got - ref).max() <= bound
    # and in practice it is far tighter: relative RMS error under 2%
    rms = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rms < 0.02


def _psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(peak**2 / max(mse, 1e-12)))


def test_int8_decode_fidelity_and_shared_tree(tmp_path):
    """The int8 generator decodes close to the f32 one (tanh-image PSNR)
    from the SAME param tree — checkpoints/artifacts are interchangeable."""
    config = load_config(write_tiny_config(tmp_path))
    f32 = Models(config)
    q = Models(config, int8_decode=True)
    state = init_train_state(config, f32, jax.random.key(0))

    # identical trees: the quantization is apply-time only
    assert jax.tree.structure(
        f32.generator.init(
            jax.random.key(1),
            jnp.zeros((1, 32, 32, 1)),
            jnp.zeros((f32.n_style_blocks, 1, 6)),
        )
    ) == jax.tree.structure(
        q.generator.init(
            jax.random.key(1),
            jnp.zeros((1, 32, 32, 1)),
            jnp.zeros((q.n_style_blocks, 1, 6)),
        )
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 1)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(f32.n_style_blocks, 4, 6)).astype(np.float32)
    )
    y_f32 = np.asarray(f32.generator.apply(state.params_g, x, w))
    y_q = np.asarray(q.generator.apply(state.params_g, x, w))
    assert y_q.shape == y_f32.shape
    assert np.all(np.isfinite(y_q))
    psnr = _psnr(y_q, y_f32)
    # tanh output in [-1, 1] (peak-to-peak 2): 30 dB is a conservative
    # floor; fresh-init nets typically measure far higher
    assert psnr > 30.0, f"int8 decode PSNR {psnr:.1f} dB below floor"


def test_int8_models_rejected_by_train_step(tmp_path):
    from one_to_many_gan_tpu.core.train_step import make_train_step

    config = load_config(write_tiny_config(tmp_path))
    q = Models(config, int8_decode=True)
    with pytest.raises(ValueError, match="int8"):
        make_train_step(config, q)


def test_int8_engine_serves(tmp_path):
    """InferenceEngine(int8=True) produces valid, near-f32 outputs through
    the full serving path (fresh weights; no checkpoint needed)."""
    from one_to_many_gan_tpu.serve import InferenceEngine

    config = load_config(write_tiny_config(tmp_path))
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))
    eng_f32 = InferenceEngine(
        config, buckets=(4,), state=state, batch_buckets=(1,)
    )
    eng_q = InferenceEngine(
        config, buckets=(4,), state=state, batch_buckets=(1,), int8=True
    )
    src = np.zeros((32, 32, 1), np.uint8)
    src[8:24, 8:24] = 255
    out_f32 = eng_f32.generate(src, n=4, seed=3)
    out_q = eng_q.generate(src, n=4, seed=3)
    assert out_q.shape == out_f32.shape
    assert out_q.dtype == np.uint8
    # uint8 grids: quantization may move a pixel a few levels, not many
    diff = np.abs(out_q.astype(int) - out_f32.astype(int))
    assert float(np.mean(diff)) < 4.0
