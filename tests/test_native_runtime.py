"""Native C++ runtime tests: decode parity with PIL, batch assembly parity."""

import numpy as np
import pytest

from one_to_many_gan_tpu import runtime
from one_to_many_gan_tpu.data import (
    BatchIterator,
    ShoeDataset,
    write_synthetic_dataset_dirs,
)
from one_to_many_gan_tpu.data.pipeline import normalize_u8

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime not built"
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    write_synthetic_dataset_dirs(root, n_train=6, n_test=2, image_size=(24, 20))
    return root


def test_decode_parity_with_pil_same_size(dataset_dir):
    """At native resolution the decode paths must agree exactly."""
    pil = ShoeDataset(dataset_dir, mode="train", image_size=(24, 20), channels=1)
    nat = ShoeDataset(
        dataset_dir, mode="train", image_size=(24, 20), channels=1, native=True
    )
    np.testing.assert_array_equal(pil.images, nat.images)


def test_native_resize_close_to_pil(dataset_dir):
    """Resize paths differ in antialiasing; require bounded deviation."""
    pil = ShoeDataset(dataset_dir, mode="train", image_size=(12, 10), channels=1)
    nat = ShoeDataset(
        dataset_dir, mode="train", image_size=(12, 10), channels=1, native=True
    )
    diff = np.abs(pil.images.astype(int) - nat.images.astype(int)).mean()
    assert diff < 30.0  # same content, different filter support


def test_assemble_batch_matches_numpy(dataset_dir):
    ds = ShoeDataset(dataset_dir, mode="train", image_size=(24, 20), channels=1)
    idx = np.asarray([3, 0, 5], dtype=np.int64)
    flips = np.asarray([1, 0, 1], dtype=np.uint8)
    out = runtime.assemble_batch(ds.images, idx, flips)

    ref = ds.images[idx].copy()
    ref[flips.astype(bool)] = ref[flips.astype(bool), :, ::-1]
    np.testing.assert_allclose(out, normalize_u8(ref), atol=1e-6)


def test_iterator_native_matches_python(dataset_dir):
    ds = ShoeDataset(dataset_dir, mode="train", image_size=(24, 20), channels=1)
    py = BatchIterator(ds.images, 2, shuffle=True, flip_prob=0.5, seed=3)
    nat = BatchIterator(ds.images, 2, shuffle=True, flip_prob=0.5, seed=3, native=True)
    for _ in range(5):
        np.testing.assert_allclose(next(py), next(nat), atol=1e-6)


def test_load_images_error_on_missing():
    with pytest.raises(RuntimeError, match="failed to decode"):
        runtime.load_images(["/nonexistent/x.png"], (8, 8), 1)
