"""FID / KID metrics (reference consumes these via the external clean-fid
dependency, src/core/evaluation.py:64-69).

The Fréchet and kernel distances are implemented exactly (Fréchet via
symmetric matrix sqrt; KID via the unbiased cubic-polynomial-kernel MMD^2
averaged over subsets — clean-fid protocol: subset size 1000, 100 subsets).

Feature extraction is pluggable. The canonical extractor is InceptionV3
pool3 (what clean-fid uses); in weight-less environments (no network
egress) the default falls back to a *deterministic random-projection conv
feature extractor* — a fixed-seed, frozen conv net. Distances computed
with it are valid for RELATIVE tracking across checkpoints of the same
run, but are NOT comparable to published Inception-FID numbers; pass an
Inception-weights path to get comparable numbers (see
metrics/inception.py).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from pathlib import Path

import numpy as np
import scipy.linalg


@dataclasses.dataclass
class FeatureStats:
    mu: np.ndarray  # [D]
    sigma: np.ndarray  # [D, D]
    features: np.ndarray  # [N, D]


def frechet_distance(
    stats1: FeatureStats, stats2: FeatureStats, eps: float = 1e-6
) -> float:
    """|mu1-mu2|^2 + tr(S1 + S2 - 2 sqrtm(S1 S2)).

    Near-singular covariances (few eval images) can make sqrtm non-finite;
    like clean-fid/pytorch-fid, retry with an ``eps * I`` offset on both
    covariances before giving up.
    """
    mu1, s1 = stats1.mu, stats1.sigma
    mu2, s2 = stats2.mu, stats2.sigma
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(s1 @ s2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm((s1 + offset) @ (s2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * np.trace(covmean))


def kernel_distance(
    feats1: np.ndarray,
    feats2: np.ndarray,
    subset_size: int = 1000,
    num_subsets: int = 100,
    seed: int = 0,
) -> float:
    """Unbiased MMD^2 with kernel (x.y/D + 1)^3, clean-fid subset protocol."""
    n = min(subset_size, feats1.shape[0], feats2.shape[0])
    d = feats1.shape[1]
    rng = np.random.default_rng(seed)
    total = 0.0
    for _ in range(num_subsets):
        x = feats1[rng.choice(feats1.shape[0], n, replace=False)].astype(np.float64)
        y = feats2[rng.choice(feats2.shape[0], n, replace=False)].astype(np.float64)
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        a = (kxx.sum() - np.trace(kxx) + kyy.sum() - np.trace(kyy)) / (n * (n - 1))
        b = 2.0 * kxy.mean()
        total += a - b
    return float(total / num_subsets)


def compute_stats(features: np.ndarray) -> FeatureStats:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return FeatureStats(mu=mu, sigma=np.atleast_2d(sigma), features=features)


# ------------------------------------------------------------ extractors

FeatureFn = Callable[[np.ndarray], np.ndarray]
"""[N,H,W,C] uint8 -> [N,D] float features."""


def random_projection_extractor(
    feature_dim: int = 256, image_size: int = 64, seed: int = 1234
) -> FeatureFn:
    """Frozen random conv features (fallback when no Inception weights).

    3 strided random conv layers + global pooling + random projection,
    computed in JAX. Deterministic across processes/runs (fixed seed).
    """
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.key(seed), 4)
    c0, c1, c2 = 16, 32, 64
    w0 = jax.random.normal(keys[0], (5, 5, 1, c0)) / np.sqrt(25)
    w1 = jax.random.normal(keys[1], (3, 3, c0, c1)) / np.sqrt(9 * c0)
    w2 = jax.random.normal(keys[2], (3, 3, c1, c2)) / np.sqrt(9 * c1)
    proj = jax.random.normal(keys[3], (2 * c2, feature_dim)) / np.sqrt(2 * c2)

    @jax.jit
    def forward(x):
        def conv(z, w, stride):
            return jax.lax.conv_general_dilated(
                z, w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        z = jax.nn.leaky_relu(conv(x, w0, 2), 0.2)
        z = jax.nn.leaky_relu(conv(z, w1, 2), 0.2)
        z = jax.nn.leaky_relu(conv(z, w2, 2), 0.2)
        pooled = jnp.concatenate(
            [jnp.mean(z, axis=(1, 2)), jnp.max(z, axis=(1, 2))], axis=-1
        )
        return pooled @ proj

    def extract(images_u8: np.ndarray) -> np.ndarray:
        from one_to_many_gan_tpu.ops.resample import bilinear_resize

        x = images_u8.astype(np.float32) / 127.5 - 1.0
        if x.shape[-1] != 1:
            x = x.mean(axis=-1, keepdims=True)
        x = jnp.asarray(x)
        if x.shape[1] != image_size or x.shape[2] != image_size:
            x = bilinear_resize(x, image_size, image_size)
        out = []
        batch = 64
        for i in range(0, x.shape[0], batch):
            out.append(np.asarray(forward(x[i : i + batch])))
        return np.concatenate(out)

    return extract


class InceptionUnavailableError(RuntimeError):
    """Raised when ``require_inception=True`` but no InceptionV3 weights
    could be loaded — the run would otherwise silently log relative-only
    random-projection FID numbers that are NOT comparable to the reference
    protocol (clean-fid InceptionV3, reference src/core/evaluation.py:64-69).
    """


def default_extractor(*, require_inception: bool = False) -> tuple[FeatureFn, str]:
    """Best available feature extractor + its name.

    Prefers InceptionV3 pool3 when pretrained weights are present
    (metrics/inception.py), else the deterministic random-conv fallback.
    With ``require_inception=True`` (tpu.require_inception_fid) the
    fallback becomes a hard error instead.
    """
    from one_to_many_gan_tpu.metrics.inception import try_load_inception

    inception = try_load_inception()
    if inception is not None:
        return inception, "inception_v3_pool3"
    if require_inception:
        msg = (
            "tpu.require_inception_fid=true but no InceptionV3 weights are "
            "available (set OTM_INCEPTION_WEIGHTS or place them on the "
            "default path — see metrics/inception.py); refusing to log a "
            "non-comparable random-projection FID"
        )
        raise InceptionUnavailableError(msg)
    return random_projection_extractor(), "random_projection_v1"


# ------------------------------------------------------------ entry points


def _load_dir(path: Path | str, limit: int | None = None) -> np.ndarray:
    from PIL import Image

    files = sorted(Path(path).rglob("*.png")) + sorted(Path(path).rglob("*.jpg"))
    if limit is not None:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    arrs = []
    for f in files:
        a = np.asarray(Image.open(f).convert("L"), dtype=np.uint8)
        arrs.append(a[:, :, None])
    return np.stack(arrs)


def compute_fid(
    images1: np.ndarray | str | Path,
    images2: np.ndarray | str | Path,
    extractor: FeatureFn | None = None,
) -> float:
    """FID between two image sets (uint8 arrays or directories of images)."""
    if extractor is None:
        extractor, _ = default_extractor()
    a = _load_dir(images1) if isinstance(images1, (str, Path)) else images1
    b = _load_dir(images2) if isinstance(images2, (str, Path)) else images2
    return frechet_distance(
        compute_stats(extractor(a)), compute_stats(extractor(b))
    )


def compute_kid(
    images1: np.ndarray | str | Path,
    images2: np.ndarray | str | Path,
    extractor: FeatureFn | None = None,
    subset_size: int = 1000,
    num_subsets: int = 100,
) -> float:
    """KID between two image sets (clean-fid subset protocol)."""
    if extractor is None:
        extractor, _ = default_extractor()
    a = _load_dir(images1) if isinstance(images1, (str, Path)) else images1
    b = _load_dir(images2) if isinstance(images2, (str, Path)) else images2
    return kernel_distance(
        extractor(a), extractor(b), subset_size=subset_size, num_subsets=num_subsets
    )
