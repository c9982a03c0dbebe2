"""Batch pipeline: infinite, shuffled, per-host-sharded iterators.

Replaces the reference's three ``DataLoader``s wrapped in
``itertools.cycle`` (train.py:131-169): epoch-permutation shuffling with
``drop_last``, per-item random horizontal flip (p=0.5), and [-1, 1]
normalization.

TPU-native notes: datasets are held as uint8; a batch is gathered,
flipped, and normalized in one vectorized numpy pass (microseconds at the
reference's batch sizes), so the host never bottlenecks the device. In a
multi-host (DCN) deployment each process constructs the iterator with its
``process_index``/``process_count`` so every host draws a disjoint shard of
each epoch (SURVEY.md §5, per-host input sharding).
"""

from __future__ import annotations

import numpy as np


def normalize_u8(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1, 1] (ToTensor + Normalize((0.5,),(0.5,)))."""
    return batch_u8.astype(np.float32) / 127.5 - 1.0


class BatchIterator:
    """Infinite iterator over a uint8 image array.

    Args:
        images: [N, H, W, C] uint8.
        batch_size: per-host batch size.
        shuffle: epoch-permutation shuffling (training) or sequential (val).
        flip_prob: per-sample horizontal flip probability.
        seed: RNG seed (deterministic stream).
        host_id/host_count: this process's shard of each epoch.
    """

    def __init__(
        self,
        images: np.ndarray,
        batch_size: int,
        *,
        shuffle: bool = True,
        flip_prob: float = 0.5,
        seed: int = 0,
        host_id: int = 0,
        host_count: int = 1,
        native: bool = False,
        as_float: bool = True,
    ):
        if images.ndim != 4:
            msg = f"expected [N,H,W,C], got {images.shape}"
            raise ValueError(msg)
        self.native = native
        if native:
            from one_to_many_gan_tpu import runtime

            if not runtime.available():
                self.native = False
        self.images = images
        self.batch_size = batch_size
        # as_float=False returns flipped uint8 batches: the device transfer
        # is then 4x smaller (the [-1,1] normalization runs fused inside the
        # consumer's jitted program) — this matters through a host<->device
        # tunnel and on DCN-attached hosts.
        self.as_float = as_float
        self.shuffle = shuffle
        self.flip_prob = flip_prob
        self.host_id = host_id
        self.host_count = host_count
        self._rng = np.random.default_rng(seed + host_id)
        self._queue: list[np.ndarray] = []
        n_local = len(self._epoch_order())
        if n_local < batch_size:
            msg = (
                f"dataset shard has {n_local} images < batch size {batch_size} "
                "(drop_last would yield nothing)"
            )
            raise ValueError(msg)

    def _epoch_order(self) -> np.ndarray:
        n = self.images.shape[0]
        order = (
            self._rng.permutation(n) if self.shuffle else np.arange(n)
        )
        return order[self.host_id :: self.host_count]

    def _next_indices(self) -> np.ndarray:
        """Pop the next batch's indices, refilling the epoch queue as needed."""
        if not self._queue:
            order = self._epoch_order()
            n_batches = len(order) // self.batch_size  # drop_last
            for b in range(n_batches):
                self._queue.append(
                    order[b * self.batch_size : (b + 1) * self.batch_size]
                )
        return self._queue.pop(0)

    def skip(self, n: int) -> None:
        """Advance the stream by ``n`` batches without materializing them.

        Consumes exactly the RNG draws of ``n`` ``__next__`` calls (epoch
        permutations + per-batch flip draws) while skipping the image
        gather, so an iterator skipped by ``n`` is stream-identical to one
        that produced ``n`` batches. The Trainer uses this to fast-forward
        the training data streams to the resume point: a resumed run then
        continues the exact stream an uninterrupted run would have seen,
        instead of replaying the early epochs (the reference's
        ``infinite_run.sh`` restarts the data stream from scratch on every
        interruption).
        """
        for _ in range(n):
            idx = self._next_indices()
            if self.flip_prob > 0:
                self._rng.random(len(idx))

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        idx = self._next_indices()
        flips = (
            self._rng.random(len(idx)) < self.flip_prob
            if self.flip_prob > 0
            else np.zeros(len(idx), dtype=bool)
        )
        if self.native and self.as_float:
            # (the C++ assembler emits normalized float32; uint8 batches
            # take the numpy path below — a flipped uint8 gather is cheap)
            from one_to_many_gan_tpu import runtime

            return runtime.assemble_batch(self.images, idx, flips)
        batch = self.images[idx]  # gather, uint8
        if flips.any():
            batch = batch.copy()
            batch[flips] = batch[flips, :, ::-1]
        if not self.as_float:
            return batch
        return normalize_u8(batch)
