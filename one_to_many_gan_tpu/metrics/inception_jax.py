"""InceptionV3 pool3 feature extractor in JAX (for clean-fid-comparable FID).

Functional forward of the InceptionV3 graph up to the global-average pool
(2048-d features), NHWC, with BatchNorm folded into per-channel
scale/shift at weight-load time. Weights load from a torchvision-format
state dict (``.npz`` with the same key names, or a torch checkpoint when
torch is importable). Without weights this module still provides the
architecture (numerically verified against a torch oracle in
tests/test_metrics.py); metrics/fid.py falls back to the random-projection
extractor.

Two published variants are supported (``variant`` argument):

- ``"clean_fid"`` (default): the TF-ported network clean-fid/pytorch-fid
  actually run — 3x3 average pools exclude padding from the divisor
  (``count_include_pad=False``) and Mixed_7c's branch_pool is a MAX pool
  (pytorch-fid's FIDInceptionE_2 patch). Use with the pt_inception TF
  weights for numbers comparable to published clean-fid FIDs.
- ``"torchvision"``: stock torchvision semantics — average pools divide
  by 9 everywhere and Mixed_7c pools with avg. Use with torchvision's
  ``inception_v3`` ImageNet weights.

The eval resize is clean-fid's defining convention: PIL-exact bicubic
with antialiasing (ops/resample.py pil_bicubic_resize) on the 0..255
scale, then (x - 127.5) / 127.5.

Reference consumer contract: clean-fid's InceptionV3 pool3 features
(reference src/core/evaluation.py:64-69 via the clean-fid dep).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3


def _conv(x, w, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    return jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _cbr(params, name, x, stride=1, padding=(0, 0)):
    """BasicConv2d: conv (no bias) + folded-BN scale/shift + ReLU."""
    p = params[name]
    y = _conv(x, p["w"], stride, padding)
    return jax.nn.relu(y * p["scale"] + p["shift"])


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _maxpool3s1p1(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _avgpool3s1p1(x, *, count_include_pad: bool):
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return summed / counts


def _inception_a(params, prefix, x, *, cip):
    b1 = _cbr(params, f"{prefix}.branch1x1", x)
    b5 = _cbr(params, f"{prefix}.branch5x5_1", x)
    b5 = _cbr(params, f"{prefix}.branch5x5_2", b5, padding=2)
    b3 = _cbr(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _cbr(params, f"{prefix}.branch3x3dbl_2", b3, padding=1)
    b3 = _cbr(params, f"{prefix}.branch3x3dbl_3", b3, padding=1)
    bp = _cbr(params, f"{prefix}.branch_pool", _avgpool3s1p1(x, count_include_pad=cip))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, prefix, x):
    b3 = _cbr(params, f"{prefix}.branch3x3", x, stride=2)
    bd = _cbr(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _cbr(params, f"{prefix}.branch3x3dbl_2", bd, padding=1)
    bd = _cbr(params, f"{prefix}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _inception_c(params, prefix, x, *, cip):
    b1 = _cbr(params, f"{prefix}.branch1x1", x)
    b7 = _cbr(params, f"{prefix}.branch7x7_1", x)
    b7 = _cbr(params, f"{prefix}.branch7x7_2", b7, padding=(0, 3))
    b7 = _cbr(params, f"{prefix}.branch7x7_3", b7, padding=(3, 0))
    bd = _cbr(params, f"{prefix}.branch7x7dbl_1", x)
    bd = _cbr(params, f"{prefix}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _cbr(params, f"{prefix}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _cbr(params, f"{prefix}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _cbr(params, f"{prefix}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _cbr(params, f"{prefix}.branch_pool", _avgpool3s1p1(x, count_include_pad=cip))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, prefix, x):
    b3 = _cbr(params, f"{prefix}.branch3x3_1", x)
    b3 = _cbr(params, f"{prefix}.branch3x3_2", b3, stride=2)
    b7 = _cbr(params, f"{prefix}.branch7x7x3_1", x)
    b7 = _cbr(params, f"{prefix}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _cbr(params, f"{prefix}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _cbr(params, f"{prefix}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _inception_e(params, prefix, x, *, cip, max_branch_pool=False):
    b1 = _cbr(params, f"{prefix}.branch1x1", x)
    b3 = _cbr(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            _cbr(params, f"{prefix}.branch3x3_2a", b3, padding=(0, 1)),
            _cbr(params, f"{prefix}.branch3x3_2b", b3, padding=(1, 0)),
        ],
        axis=-1,
    )
    bd = _cbr(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _cbr(params, f"{prefix}.branch3x3dbl_2", bd, padding=1)
    bd = jnp.concatenate(
        [
            _cbr(params, f"{prefix}.branch3x3dbl_3a", bd, padding=(0, 1)),
            _cbr(params, f"{prefix}.branch3x3dbl_3b", bd, padding=(1, 0)),
        ],
        axis=-1,
    )
    pooled = (
        _maxpool3s1p1(x)
        if max_branch_pool
        else _avgpool3s1p1(x, count_include_pad=cip)
    )
    bp = _cbr(params, f"{prefix}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3_features(
    params: dict, x: jax.Array, variant: str = "clean_fid"
) -> jax.Array:
    """x: [N, 299, 299, 3] in [-1, 1] -> pool3 features [N, 2048].

    ``variant``: "clean_fid" (TF-ported pooling semantics, what published
    FID numbers use) or "torchvision" (stock torchvision inception_v3).
    """
    if variant not in ("clean_fid", "torchvision"):
        msg = f"unknown inception variant {variant!r}"
        raise ValueError(msg)
    cip = variant == "torchvision"  # count_include_pad in 3x3 avg pools
    y = _cbr(params, "Conv2d_1a_3x3", x, stride=2)
    y = _cbr(params, "Conv2d_2a_3x3", y)
    y = _cbr(params, "Conv2d_2b_3x3", y, padding=1)
    y = _maxpool3s2(y)
    y = _cbr(params, "Conv2d_3b_1x1", y)
    y = _cbr(params, "Conv2d_4a_3x3", y)
    y = _maxpool3s2(y)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        y = _inception_a(params, name, y, cip=cip)
    y = _inception_b(params, "Mixed_6a", y)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        y = _inception_c(params, name, y, cip=cip)
    y = _inception_d(params, "Mixed_7a", y)
    y = _inception_e(params, "Mixed_7b", y, cip=cip)
    y = _inception_e(
        params, "Mixed_7c", y, cip=cip,
        max_branch_pool=(variant == "clean_fid"),
    )
    return jnp.mean(y, axis=(1, 2))


# ------------------------------------------------------------ weights

# (name, in_ch, out_ch, kh, kw) for every BasicConv2d, for shape checks
# and random-init tests.
def _conv_specs() -> list[tuple[str, int, int, int, int]]:
    specs = [
        ("Conv2d_1a_3x3", 3, 32, 3, 3),
        ("Conv2d_2a_3x3", 32, 32, 3, 3),
        ("Conv2d_2b_3x3", 32, 64, 3, 3),
        ("Conv2d_3b_1x1", 64, 80, 1, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]

    def a_block(prefix, in_ch, pool_features):
        return [
            (f"{prefix}.branch1x1", in_ch, 64, 1, 1),
            (f"{prefix}.branch5x5_1", in_ch, 48, 1, 1),
            (f"{prefix}.branch5x5_2", 48, 64, 5, 5),
            (f"{prefix}.branch3x3dbl_1", in_ch, 64, 1, 1),
            (f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3),
            (f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3),
            (f"{prefix}.branch_pool", in_ch, pool_features, 1, 1),
        ]

    specs += a_block("Mixed_5b", 192, 32)
    specs += a_block("Mixed_5c", 256, 64)
    specs += a_block("Mixed_5d", 288, 64)
    specs += [
        ("Mixed_6a.branch3x3", 288, 384, 3, 3),
        ("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1),
        ("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3),
        ("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3),
    ]

    def c_block(prefix, c7):
        return [
            (f"{prefix}.branch1x1", 768, 192, 1, 1),
            (f"{prefix}.branch7x7_1", 768, c7, 1, 1),
            (f"{prefix}.branch7x7_2", c7, c7, 1, 7),
            (f"{prefix}.branch7x7_3", c7, 192, 7, 1),
            (f"{prefix}.branch7x7dbl_1", 768, c7, 1, 1),
            (f"{prefix}.branch7x7dbl_2", c7, c7, 7, 1),
            (f"{prefix}.branch7x7dbl_3", c7, c7, 1, 7),
            (f"{prefix}.branch7x7dbl_4", c7, c7, 7, 1),
            (f"{prefix}.branch7x7dbl_5", c7, 192, 1, 7),
            (f"{prefix}.branch_pool", 768, 192, 1, 1),
        ]

    specs += c_block("Mixed_6b", 128)
    specs += c_block("Mixed_6c", 160)
    specs += c_block("Mixed_6d", 160)
    specs += c_block("Mixed_6e", 192)
    specs += [
        ("Mixed_7a.branch3x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch3x3_2", 192, 320, 3, 3),
        ("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1),
        ("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7),
        ("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1),
        ("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3),
    ]

    def e_block(prefix, in_ch):
        return [
            (f"{prefix}.branch1x1", in_ch, 320, 1, 1),
            (f"{prefix}.branch3x3_1", in_ch, 384, 1, 1),
            (f"{prefix}.branch3x3_2a", 384, 384, 1, 3),
            (f"{prefix}.branch3x3_2b", 384, 384, 3, 1),
            (f"{prefix}.branch3x3dbl_1", in_ch, 448, 1, 1),
            (f"{prefix}.branch3x3dbl_2", 448, 384, 3, 3),
            (f"{prefix}.branch3x3dbl_3a", 384, 384, 1, 3),
            (f"{prefix}.branch3x3dbl_3b", 384, 384, 3, 1),
            (f"{prefix}.branch_pool", in_ch, 192, 1, 1),
        ]

    specs += e_block("Mixed_7b", 1280)
    specs += e_block("Mixed_7c", 2048)
    return specs


def random_params(seed: int = 0) -> dict:
    """Random-initialized parameter set with the correct shapes (tests)."""
    rng = np.random.default_rng(seed)
    params = {}
    for name, cin, cout, kh, kw in _conv_specs():
        params[name] = {
            "w": jnp.asarray(
                rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
                / np.sqrt(kh * kw * cin)
            ),
            "scale": jnp.ones((cout,), jnp.float32),
            "shift": jnp.zeros((cout,), jnp.float32),
        }
    return params


def fold_state_dict(state: dict) -> dict:
    """torchvision state-dict arrays -> folded NHWC params.

    Expects keys ``<name>.conv.weight`` (OIHW), ``<name>.bn.{weight,bias,
    running_mean,running_var}``.
    """
    params = {}
    for name, cin, cout, kh, kw in _conv_specs():
        w = np.asarray(state[f"{name}.conv.weight"])  # OIHW
        gamma = np.asarray(state[f"{name}.bn.weight"])
        beta = np.asarray(state[f"{name}.bn.bias"])
        mean = np.asarray(state[f"{name}.bn.running_mean"])
        var = np.asarray(state[f"{name}.bn.running_var"])
        if w.shape != (cout, cin, kh, kw):
            msg = f"{name}: expected {(cout, cin, kh, kw)}, got {w.shape}"
            raise ValueError(msg)
        scale = gamma / np.sqrt(var + BN_EPS)
        shift = beta - mean * scale
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(shift),
        }
    return params


def load_params(path: Path | str) -> dict:
    """Load torchvision-format weights from .npz or a torch checkpoint."""
    path = Path(path)
    if path.suffix == ".npz":
        return fold_state_dict(dict(np.load(path)))
    import torch  # torch checkpoint fallback

    state = torch.load(path, map_location="cpu", weights_only=True)
    return fold_state_dict({k: v.numpy() for k, v in state.items()})


def make_extractor(params: dict, batch: int = 32, variant: str = "clean_fid"):
    """FeatureFn over uint8 NHWC images using this JAX InceptionV3.

    Preprocessing follows clean-fid: PIL-exact bicubic antialiased resize
    to 299x299 on the 0..255 scale, then (x - 127.5) / 127.5.
    """
    from one_to_many_gan_tpu.ops.resample import pil_bicubic_resize

    forward = jax.jit(lambda x: inception_v3_features(params, x, variant))

    def extract(images_u8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(images_u8.astype(np.float32))
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        x = pil_bicubic_resize(x, 299, 299)
        x = (x - 127.5) / 127.5
        out = []
        for i in range(0, x.shape[0], batch):
            out.append(np.asarray(forward(x[i : i + batch])))
        return np.concatenate(out)

    return extract
