"""Data subsystem tests: datasets, iterators, sharding, normalization."""

import numpy as np
import pytest

from one_to_many_gan_tpu.data import (
    BatchIterator,
    ShoeDataset,
    synthetic_images,
    write_synthetic_dataset_dirs,
)
from one_to_many_gan_tpu.data.datasets import Edges2ShoesDataset
from one_to_many_gan_tpu.data.pipeline import normalize_u8


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    write_synthetic_dataset_dirs(root, n_train=10, n_test=3, image_size=(16, 12))
    return root


def test_shoe_dataset_loads(dataset_dir):
    ds = ShoeDataset(dataset_dir, mode="train", image_size=(16, 12), channels=1)
    assert ds.images.shape == (10, 16, 12, 1)
    assert ds.images.dtype == np.uint8
    ds_test = ShoeDataset(dataset_dir, mode="test", image_size=(8, 8), channels=1)
    assert ds_test.images.shape == (3, 8, 8, 1)


def test_shoe_dataset_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ShoeDataset(tmp_path, mode="train", image_size=(8, 8), channels=1)


def test_edges2shoes_halves(tmp_path):
    from PIL import Image

    d = tmp_path / "train"
    d.mkdir(parents=True)
    arr = np.zeros((256, 512), dtype=np.uint8)
    arr[:, :256] = 50  # edge half
    arr[:, 256:] = 200  # shoe half
    Image.fromarray(arr).save(d / "pair.png")

    edges = Edges2ShoesDataset(
        tmp_path, mode="train", kind="edge", image_size=(32, 32), channels=1
    )
    shoes = Edges2ShoesDataset(
        tmp_path, mode="train", kind="shoe", image_size=(32, 32), channels=1
    )
    assert edges.images.mean() == 50
    assert shoes.images.mean() == 200


def test_normalize_range():
    x = np.asarray([0, 127, 255], dtype=np.uint8).reshape(1, 1, 3, 1)
    out = normalize_u8(x)
    np.testing.assert_allclose(out.ravel(), [-1.0, -0.00392157, 1.0], atol=1e-5)


def test_iterator_epoch_coverage():
    images = synthetic_images(10, (8, 8))
    it = BatchIterator(images, 2, shuffle=True, flip_prob=0.0, seed=0)
    seen = []
    for _ in range(5):  # one epoch = 5 batches of 2
        batch = next(it)
        seen.append(batch)
    stacked = np.concatenate(seen)
    assert stacked.shape[0] == 10
    # every image appears exactly once per epoch
    ref = np.sort(normalize_u8(images).reshape(10, -1), axis=0)
    got = np.sort(stacked.reshape(10, -1), axis=0)
    np.testing.assert_allclose(ref, got, atol=1e-6)


def test_iterator_host_sharding_disjoint():
    images = synthetic_images(8, (8, 8))
    it0 = BatchIterator(images, 2, shuffle=False, flip_prob=0.0, host_id=0, host_count=2)
    it1 = BatchIterator(images, 2, shuffle=False, flip_prob=0.0, host_id=1, host_count=2)
    a = np.concatenate([next(it0), next(it0)])
    b = np.concatenate([next(it1), next(it1)])
    flat_a = {tuple(x.ravel()[:5].tolist()) for x in a}
    flat_b = {tuple(x.ravel()[:5].tolist()) for x in b}
    assert not flat_a & flat_b  # disjoint shards


def test_iterator_flips_some():
    rng_imgs = synthetic_images(4, (8, 8), seed=3)
    it = BatchIterator(rng_imgs, 4, shuffle=False, flip_prob=1.0, seed=0)
    batch = next(it)
    np.testing.assert_allclose(
        batch, normalize_u8(rng_imgs[:, :, ::-1]), atol=1e-6
    )


def test_iterator_batch_too_large_raises():
    images = synthetic_images(3, (8, 8))
    with pytest.raises(ValueError, match="batch size"):
        BatchIterator(images, 4)


def test_iterator_skip_matches_consumed_stream():
    """skip(n) leaves the stream exactly where n next() calls would.

    Crosses an epoch boundary (10 images / batch 3 -> 3 batches per
    epoch) so both the refill permutation draw and the per-batch flip
    draws are exercised.
    """
    images = synthetic_images(10, (8, 8), seed=5)
    for n_skip in (0, 1, 4, 7):
        ref = BatchIterator(images, 3, shuffle=True, flip_prob=0.5, seed=9)
        for _ in range(n_skip):
            next(ref)
        skipped = BatchIterator(images, 3, shuffle=True, flip_prob=0.5, seed=9)
        skipped.skip(n_skip)
        for _ in range(3):  # stream stays aligned, not just the next batch
            np.testing.assert_array_equal(next(ref), next(skipped))
