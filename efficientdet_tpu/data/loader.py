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
                 shard_index: int = 0, num_shards: int = 1,
                 native: str = "off", image_size: int = 0,
                 flip_prob: float = 0.0, cache: str = "off",
                 uint8_images: bool = False):
        """`batch_size` is the PER-HOST batch. For multi-host training pass
        shard_index=jax.process_index(), num_shards=jax.process_count():
        every host gets a disjoint, same-seed-shuffled slice per epoch (the
        sampler the reference's DDP path forgot, train.py:199-204).

        `native='auto'` activates the C++ batch pipeline
        (efficientdet_tpu.native: threaded JPEG decode + fused
        resize/flip/normalize/pad) when the library builds and the dataset
        exposes `image_path`/`load_annotations`. It replaces the standard
        Normalizer->Augmenter(flip_prob)->Resizer(image_size) transform with
        numerically identical native code; `image_size` must then be set.
        Per-image native failures (non-JPEG, corrupt file) silently fall back
        to the dataset's Python path. 'off' = always Python.

        `cache='ram'` keeps each sample's DECODED image (uint8, exact: the
        JPEG decode is 8-bit) + annotations in host RAM after first touch and
        re-applies the dataset's (random) transform per epoch — the
        tf.data-`.cache()` / DALI-decoder-cache equivalent. On 1-core hosts
        where JPEG decode is the epoch bottleneck this turns epochs 2+ from
        decode-bound into device-bound. Requires the dataset to expose
        load_image/load_annotations/transform; augmentation randomness is
        preserved because only the decode result is cached. Budget ~0.4 MB
        per 512px image (uint8); mutually exclusive with the native C++
        decode path (which exists to speed up the same stage).

        `uint8_images=True` collates image batches as uint8 [0, 255] for the
        device-normalize path (pair with transforms built with
        device_normalize=True; the jitted steps normalize uint8 inputs on
        device). Cuts the host->device image transfer 4x. With cache='ram'
        the cached uint8 arrays additionally flow through flip/resize
        without ever converting to float on the host.
        """
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
        self.image_size = image_size
        self.flip_prob = flip_prob
        self.uint8_images = uint8_images
        if uint8_images and native not in ("off",):
            native = "off"      # the C++ pipeline emits normalized f32
        self._cache = None
        if cache == "ram":
            assert hasattr(dataset, "load_image") \
                and hasattr(dataset, "load_annotations"), \
                "cache='ram' needs dataset.load_image/load_annotations"
            self._cache = {}
            native = "off"      # cache replaces the decode fast path
        elif cache != "off":
            raise ValueError(f"cache must be 'off' or 'ram', got {cache!r}")
        self._native = False
        if native != "off":
            from .. import native as native_mod
            self._native = (image_size > 0
                            and hasattr(dataset, "image_path")
                            and hasattr(dataset, "load_annotations")
                            and native_mod.available())
            if native is True or native == "on":
                assert self._native, "native pipeline requested but unavailable"

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

    def _native_batch(self, idx: Sequence[int],
                      rng: np.random.RandomState) -> dict:
        """One collated batch via the C++ pipeline (native/edt_native.cpp).

        Box handling mirrors the Python transform order exactly: flip mirrors
        x against the ORIGINAL width (Augmenter, transforms.py:60-65), then
        coordinates scale by the resize factor (Resizer, transforms.py:87-89).
        """
        from .. import native as native_mod
        from .transforms import IMAGENET_MEAN, IMAGENET_STD, pad_annotations
        paths = [self.dataset.image_path(int(i)) for i in idx]
        flips = (rng.rand(len(idx)) < self.flip_prob
                 if self.flip_prob > 0 else np.zeros(len(idx), bool))
        images, scales, ok = native_mod.decode_resize_batch(
            paths, self.image_size, flips, IMAGENET_MEAN, IMAGENET_STD)
        annots = []
        for j, i in enumerate(idx):
            if not ok[j]:
                sample = self.dataset[int(i)]   # full Python fallback
                images[j] = sample["img"]
                scales[j] = sample.get("scale", 1.0)
                annots.append(np.asarray(sample["annot"], np.float32))
                continue
            a = np.asarray(self.dataset.load_annotations(int(i)),
                           np.float32).reshape(-1, 5).copy()
            if flips[j] and len(a):
                w = native_mod.image_dims(paths[j])[0]
                x1, x2 = a[:, 0].copy(), a[:, 2].copy()
                a[:, 0] = w - x2
                a[:, 2] = w - x1
            a[:, :4] *= scales[j]
            annots.append(a)
        return {"images": images,
                "annotations": pad_annotations(annots, self.max_boxes),
                "scales": scales}

    def _cached_sample(self, i: int) -> dict:
        """dataset[i] with the decode served from the RAM cache.

        Mirrors the datasets' __getitem__ contract exactly (voc.py:89-94):
        {'img' float32 [0,1], 'annot' (N,5), 'scale' 1.0} through the
        dataset's transform. uint8 storage is lossless — load_image is an
        8-bit decode scaled by 1/255, which the round trip inverts exactly.
        """
        ent = self._cache.get(i)
        if ent is None:
            img = self.dataset.load_image(i)
            ann = np.asarray(self.dataset.load_annotations(i),
                             np.float32).reshape(-1, 5)
            ent = (np.round(img * 255.0).astype(np.uint8), ann)
            self._cache[i] = ent
        img8, ann = ent
        # uint8 batches flow through flip/resize without a float round trip
        img = img8 if self.uint8_images else img8.astype(np.float32) / 255.0
        sample = {"img": img, "annot": ann.copy(), "scale": 1.0}
        transform = getattr(self.dataset, "transform", None)
        return transform(sample) if transform is not None else sample

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        rng = np.random.RandomState(self.seed * 9973 + self._epoch)

        def batches():
            for idx in self._batch_indices():
                if self._native:
                    yield self._native_batch(idx, rng)
                elif self._cache is not None:
                    samples = [self._cached_sample(int(i)) for i in idx]
                    yield collate(samples, self.max_boxes,
                                  uint8_images=self.uint8_images)
                else:
                    samples = [self.dataset[int(i)] for i in idx]
                    yield collate(samples, self.max_boxes,
                                  uint8_images=self.uint8_images)

        return prefetch_iter(batches(), depth=self.prefetch)


def eval_batches(dataset, batch_size: int, image_size: int = 0,
                 native: str = "auto") -> Iterator[tuple]:
    """Sequential eval batches: yields (indices, images (B,S,S,3) f32,
    scales (B,)); the last batch is zero-padded to the static batch size so
    a jitted eval step never retraces.

    Uses the native C++ decode pipeline when available (same activation rules
    as DataLoader), falling back to `dataset[i]`'s Python transform path.
    """
    use_native = False
    if native != "off" and image_size > 0:
        from .. import native as native_mod
        use_native = (hasattr(dataset, "image_path")
                      and hasattr(dataset, "load_annotations")
                      and native_mod.available())
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        if use_native:
            from .. import native as native_mod
            from .transforms import IMAGENET_MEAN, IMAGENET_STD
            paths = [dataset.image_path(i) for i in idx]
            images, scales, ok = native_mod.decode_resize_batch(
                paths, image_size, None, IMAGENET_MEAN, IMAGENET_STD)
            for j, i in enumerate(idx):
                if not ok[j]:
                    s = dataset[i]
                    images[j] = s["img"]
                    scales[j] = s.get("scale", 1.0)
        else:
            samples = [dataset[i] for i in idx]
            images = np.stack([s["img"] for s in samples]).astype(np.float32)
            scales = np.array([s.get("scale", 1.0) for s in samples],
                              np.float32)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], np.float32)])
            scales = np.concatenate([scales, np.ones((pad,), np.float32)])
        yield idx, images, scales


def prefetch_iter(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` in a background thread with a bounded queue, overlapping host
    work (decode) with device compute.

    Worker exceptions are captured and RE-RAISED in the consumer (not
    swallowed into a clean stop): an eval loop must crash loudly rather than
    silently report metrics over a partial prefix of the dataset."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            q.put((stop, e))

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
            raise item[1]
        yield item


def shard_batch(batch: dict, sharding=None) -> dict:
    """Device-put a host batch, optionally with a NamedSharding whose first
    axis is the mesh data axis."""
    import jax
    if sharding is None:
        return jax.device_put(batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
