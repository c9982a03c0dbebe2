"""Metric tests: Fréchet distance, KID, extractors, InceptionV3-in-JAX."""

import numpy as np
import pytest

from one_to_many_gan_tpu.metrics import (
    compute_fid,
    compute_kid,
    compute_stats,
    frechet_distance,
    kernel_distance,
    random_projection_extractor,
)

rng = np.random.default_rng(3)


def test_frechet_identical_is_zero():
    feats = rng.standard_normal((500, 16)).astype(np.float64)
    s = compute_stats(feats)
    assert abs(frechet_distance(s, s)) < 1e-6


def test_frechet_known_gaussians():
    """For N(mu1, I) vs N(mu2, I): FID = |mu1 - mu2|^2 (covariances equal)."""
    d = 8
    a = rng.standard_normal((200_00, d))
    shift = np.full(d, 0.5)
    b = rng.standard_normal((200_00, d)) + shift
    fid = frechet_distance(compute_stats(a), compute_stats(b))
    np.testing.assert_allclose(fid, float(shift @ shift), atol=0.05)


def test_kid_identical_near_zero_and_shift_positive():
    a = rng.standard_normal((600, 16))
    b = rng.standard_normal((600, 16))
    c = rng.standard_normal((600, 16)) + 1.0
    near = kernel_distance(a, b, subset_size=300, num_subsets=20)
    far = kernel_distance(a, c, subset_size=300, num_subsets=20)
    assert abs(near) < 0.5
    assert far > near + 1.0


def test_random_projection_extractor_deterministic():
    imgs = (rng.random((6, 32, 32, 1)) * 255).astype(np.uint8)
    ex = random_projection_extractor(feature_dim=64, image_size=32)
    f1 = ex(imgs)
    f2 = random_projection_extractor(feature_dim=64, image_size=32)(imgs)
    assert f1.shape == (6, 64)
    np.testing.assert_array_equal(f1, f2)


def test_fid_kid_pipeline_discriminates():
    """End-to-end: same-distribution images score lower than different."""
    from one_to_many_gan_tpu.data import synthetic_images

    a = synthetic_images(48, (32, 32), seed=0)
    b = synthetic_images(48, (32, 32), seed=100)
    noise = (rng.random((48, 32, 32, 1)) * 255).astype(np.uint8)
    ex = random_projection_extractor(feature_dim=64, image_size=32)
    fid_close = compute_fid(a, b, ex)
    fid_far = compute_fid(a, noise, ex)
    assert fid_far > fid_close
    kid_close = compute_kid(a, b, ex, subset_size=48, num_subsets=10)
    kid_far = compute_kid(a, noise, ex, subset_size=48, num_subsets=10)
    assert kid_far > kid_close


def test_inception_jax_forward_shapes():
    """Architecture sanity: random weights, 2048-d pool3 features."""
    import jax.numpy as jnp

    from one_to_many_gan_tpu.metrics.inception_jax import (
        inception_v3_features,
        random_params,
    )

    params = random_params()
    x = jnp.asarray(rng.standard_normal((2, 299, 299, 3)).astype(np.float32))
    feats = inception_v3_features(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_inception_fold_state_dict_roundtrip():
    """BN folding: conv+BN equals folded scale/shift on random weights."""
    from one_to_many_gan_tpu.metrics.inception_jax import (
        BN_EPS,
        _conv_specs,
        fold_state_dict,
    )

    state = {}
    for name, cin, cout, kh, kw in _conv_specs():
        state[f"{name}.conv.weight"] = rng.standard_normal(
            (cout, cin, kh, kw)
        ).astype(np.float32)
        state[f"{name}.bn.weight"] = rng.random(cout).astype(np.float32) + 0.5
        state[f"{name}.bn.bias"] = rng.standard_normal(cout).astype(np.float32)
        state[f"{name}.bn.running_mean"] = rng.standard_normal(cout).astype(
            np.float32
        )
        state[f"{name}.bn.running_var"] = rng.random(cout).astype(np.float32) + 0.1
    params = fold_state_dict(state)

    name = "Conv2d_1a_3x3"
    x = rng.standard_normal((4, 3)).astype(np.float32)  # per-channel math only
    gamma = state[f"{name}.bn.weight"]
    beta = state[f"{name}.bn.bias"]
    mean = state[f"{name}.bn.running_mean"]
    var = state[f"{name}.bn.running_var"]
    conv_out = rng.standard_normal((5, 32)).astype(np.float32)
    want = (conv_out - mean) / np.sqrt(var + BN_EPS) * gamma + beta
    got = conv_out * np.asarray(params[name]["scale"]) + np.asarray(
        params[name]["shift"]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
