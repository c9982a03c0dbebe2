"""Datasets: eager in-RAM image stores (reference: src/data/datasets.py).

The reference eagerly loads every ``*.jpg``/``*.png`` under
``<root>/<mode>/`` into RAM at init with a resize -> tensor ->
normalize((0.5,), (0.5,)) transform (datasets.py:24-43, train.py:120-126).
We keep the eager design (the datasets are small) but store **uint8**
arrays — 4x less host RAM and 4x less host->device traffic; the
(x/255 - 0.5)/0.5 normalization to [-1, 1] runs vectorized at batch
assembly (see pipeline.py).

The per-item random horizontal flip (p=0.5, datasets.py:43,48-50) lives in
the batch iterator, not here.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

try:  # PIL ships with the baked-in torchvision stack
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _load_image(path: Path, image_size: tuple[int, int], channels: int) -> np.ndarray:
    """Decode + resize + layout one image to [H, W, C] uint8."""
    if Image is None:  # pragma: no cover
        msg = "PIL is required for directory datasets"
        raise RuntimeError(msg)
    h, w = image_size
    img = Image.open(path)
    img = img.convert("L" if channels == 1 else "RGB")
    img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


class ShoeDataset:
    """Eager uint8 image store for one domain.

    Args:
        path: dataset root; images are found under ``<path>/<mode>/``
            (recursive, .jpg + .png — same discovery rule as the reference).
        mode: "train" | "test" | "val".
        image_size: (height, width) resize target.
        channels: 1 (grayscale) or 3.
    """

    def __init__(
        self,
        path: Path | str,
        *,
        mode: str,
        image_size: tuple[int, int],
        channels: int,
        native: bool = False,
    ):
        root = Path(path).expanduser() / mode
        files = sorted(root.rglob("*.jpg")) + sorted(root.rglob("*.png"))
        if not files:
            raise FileNotFoundError(f"no images under {root}")
        if native:
            from one_to_many_gan_tpu import runtime

            self.images = runtime.load_images(files, image_size, channels)
        else:
            self.images = np.stack(
                [_load_image(f, image_size, channels) for f in files]
            )  # [N, H, W, C] uint8
        self.files = files

    def __len__(self) -> int:
        return self.images.shape[0]


class Edges2ShoesDataset:
    """Paired edges2shoes loader: each image holds the edge map in the left
    256px and the photo in the right 256px; ``kind`` selects the half
    (reference datasets.py:53-94 — defined there but never wired up; kept
    for capability parity)."""

    def __init__(
        self,
        path: Path | str,
        *,
        mode: str,
        kind: str,  # "edge" | "shoe"
        image_size: tuple[int, int],
        channels: int,
    ):
        if kind not in ("edge", "shoe"):
            msg = f"kind must be edge|shoe, got {kind}"
            raise ValueError(msg)
        if Image is None:  # pragma: no cover
            msg = "PIL is required"
            raise RuntimeError(msg)
        root = Path(path).expanduser() / mode
        files = sorted(root.rglob("*.jpg")) + sorted(root.rglob("*.png"))
        if not files:
            raise FileNotFoundError(f"no images under {root}")
        h, w = image_size
        images = []
        for f in files:
            img = Image.open(f)
            box = (0, 0, 256, 256) if kind == "edge" else (256, 0, 512, 256)
            img = img.crop(box).convert("L" if channels == 1 else "RGB")
            img = img.resize((w, h), Image.BILINEAR)
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            images.append(arr)
        self.images = np.stack(images)
        self.files = files

    def __len__(self) -> int:
        return self.images.shape[0]


class ArrayDataset:
    """Dataset wrapping a pre-built uint8 array (synthetic data, tests)."""

    def __init__(self, images: np.ndarray):
        if images.dtype != np.uint8 or images.ndim != 4:
            msg = f"expected uint8 [N,H,W,C], got {images.dtype} {images.shape}"
            raise ValueError(msg)
        self.images = images

    def __len__(self) -> int:
        return self.images.shape[0]


def synthetic_images(
    n: int, image_size: tuple[int, int], channels: int = 1, seed: int = 0
) -> np.ndarray:
    """Structured synthetic images (blobs + ridges) for tests/benchmarks.

    Not a reference behavior — the reference assumes a private forensic
    dataset; this generates stand-in data with spatial structure so
    training signals and FID-style metrics are non-degenerate.
    """
    h, w = image_size
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.empty((n, h, w, channels), dtype=np.uint8)
    for i in range(n):
        img = np.zeros((h, w), dtype=np.float32)
        for _ in range(rng.integers(2, 6)):
            cy, cx = rng.uniform(0, h), rng.uniform(0, w)
            sy, sx = rng.uniform(h / 16, h / 3), rng.uniform(w / 16, w / 3)
            img += rng.uniform(0.3, 1.0) * np.exp(
                -((yy - cy) ** 2 / (2 * sy**2) + (xx - cx) ** 2 / (2 * sx**2))
            )
        freq = rng.uniform(0.1, 0.5)
        phase = rng.uniform(0, 2 * np.pi)
        angle = rng.uniform(0, np.pi)
        img += 0.3 * np.sin(
            freq * (np.cos(angle) * xx + np.sin(angle) * yy) + phase
        )
        img += rng.normal(0, 0.05, size=img.shape)
        img = (img - img.min()) / (img.max() - img.min() + 1e-8)
        arr = (img * 255).astype(np.uint8)
        out[i] = np.repeat(arr[:, :, None], channels, axis=2)
    return out


def write_synthetic_dataset_dirs(
    root: Path | str,
    *,
    n_train: int = 16,
    n_test: int = 4,
    image_size: tuple[int, int] = (64, 64),
    channels: int = 1,
    seed: int = 0,
) -> Path:
    """Write a synthetic dataset directory tree (train/ and test/ PNGs)."""
    if Image is None:  # pragma: no cover
        msg = "PIL is required"
        raise RuntimeError(msg)
    root = Path(root)
    for mode, n, offset in (("train", n_train, 0), ("test", n_test, 10_000)):
        d = root / mode
        d.mkdir(parents=True, exist_ok=True)
        imgs = synthetic_images(n, image_size, channels, seed=seed + offset)
        for i, arr in enumerate(imgs):
            Image.fromarray(arr.squeeze(-1) if channels == 1 else arr).save(
                d / f"{i:05d}.png"
            )
    return root
