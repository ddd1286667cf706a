"""Batched data loading with background prefetch and device sharding.

Replaces the reference's torch DataLoader + DDP data division
(train.py:199-210, 247-249). TPU-first differences:

- fixed max_boxes padding (never retraces; the reference pads per-batch)
- background-thread prefetch pipelines host preprocessing with device compute
  (cv2/numpy release the GIL for the heavy parts)
- `shard` places each global batch on the mesh with the batch axis split
  over the data axis — this also fixes the reference's missing
  DistributedSampler (every DDP rank iterated the FULL dataset,
  train.py:199-204): here a global batch is a single logical array, sharded.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from .transforms import collate


class DataLoader:
    """Minimal epoch-based loader: shuffle, batch, collate, prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 max_boxes: int = 100, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1):
        """`batch_size` is the PER-HOST batch. For multi-host training pass
        shard_index=jax.process_index(), num_shards=jax.process_count():
        every host gets a disjoint, same-seed-shuffled slice per epoch (the
        sampler the reference's DDP path forgot, train.py:199-204)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_boxes = max_boxes
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> Iterator[Sequence[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # same seed on every host -> consistent global permutation
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        order = order[self.shard_index::self.num_shards]
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield idx

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for idx in self._batch_indices():
                    samples = [self.dataset[int(i)] for i in idx]
                    q.put(collate(samples, self.max_boxes))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def shard_batch(batch: dict, sharding=None) -> dict:
    """Device-put a host batch, optionally with a NamedSharding whose first
    axis is the mesh data axis."""
    import jax
    if sharding is None:
        return jax.device_put(batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
