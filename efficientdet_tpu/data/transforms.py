"""Sample transforms (host-side numpy, fixed output shapes).

Parity with the reference's *used* training path (train.py:176-196 composing
Normalizer / Augmenter / Resizer from datasets/augmentation.py:94-150), plus a
richer optional augmentation stack standing in for the albumentations pipeline
(datasets/augmentation.py:8-50 — albumentations is not available here, so the
equivalent photometric/geometric ops are implemented in numpy).

All transforms take and return a sample dict:
    {'img': (H, W, 3) float32 RGB, 'annot': (N, 5) float32 [x1,y1,x2,y2,label],
     'scale': float}
The Resizer produces a fixed (size, size, 3) canvas so downstream shapes are
static for XLA.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, sample: dict) -> dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


class Normalizer:
    """ImageNet mean/std (reference datasets/augmentation.py:141-150)."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, sample: dict) -> dict:
        img = (sample["img"].astype(np.float32) - self.mean) / self.std
        return {**sample, "img": img}


class Augmenter:
    """Random horizontal flip with box x-mirror (reference augmentation.py:118-138)."""

    def __init__(self, flip_prob: float = 0.5,
                 rng: Optional[np.random.RandomState] = None):
        self.flip_prob = flip_prob
        self.rng = rng or np.random.RandomState()

    def __call__(self, sample: dict) -> dict:
        if self.rng.rand() >= self.flip_prob:
            return sample
        img = sample["img"][:, ::-1, :]
        annot = sample["annot"].copy()
        cols = img.shape[1]
        x1 = annot[:, 0].copy()
        x2 = annot[:, 2].copy()
        annot[:, 0] = cols - x2
        annot[:, 2] = cols - x1
        return {**sample, "img": np.ascontiguousarray(img), "annot": annot}


class Resizer:
    """Longest-side resize + zero-pad to a square canvas
    (reference augmentation.py:94-115). Annotations are scaled; the scale
    factor is kept for mapping detections back to original pixels."""

    def __init__(self, size: int = 512):
        self.size = size

    def __call__(self, sample: dict) -> dict:
        img = sample["img"]
        h, w = img.shape[:2]
        if (h, w) == (self.size, self.size):
            # already the target canvas: identity (scale 1, no pad). Saves
            # a cv2.resize + full-canvas copy per image on datasets stored
            # at the network's native resolution.
            return {**sample, "scale": 1.0}
        import cv2
        scale = self.size / max(h, w)
        nh, nw = ((self.size, int(w * scale)) if h > w
                  else (int(h * scale), self.size))
        resized = cv2.resize(img, (nw, nh))
        canvas = np.zeros((self.size, self.size, 3), dtype=img.dtype)
        canvas[:nh, :nw] = resized
        annot = sample["annot"].copy()
        if len(annot):
            annot[:, :4] *= scale
        return {**sample, "img": canvas, "annot": annot, "scale": scale}


class PhotometricAugmenter:
    """Brightness/contrast/gamma/channel-shift jitter — numpy equivalent of
    the reference's albumentations color stack (augmentation.py:21-34)."""

    def __init__(self, brightness=0.25, contrast=0.2, gamma=(0.7, 1.3),
                 shift=0.05, prob=0.5,
                 rng: Optional[np.random.RandomState] = None):
        self.brightness = brightness
        self.contrast = contrast
        self.gamma = gamma
        self.shift = shift
        self.prob = prob
        self.rng = rng or np.random.RandomState()

    def __call__(self, sample: dict) -> dict:
        was_uint8 = sample["img"].dtype == np.uint8  # device-normalize path
        img = sample["img"].astype(np.float32)
        if was_uint8:
            img /= 255.0
        r = self.rng
        if r.rand() < self.prob:
            img = img * (1.0 + r.uniform(-self.contrast, self.contrast))
            img = img + r.uniform(-self.brightness, self.brightness)
        if r.rand() < self.prob:
            img = np.clip(img, 0.0, 1.0) ** r.uniform(*self.gamma)
        if r.rand() < self.prob:
            img = img + r.uniform(-self.shift, self.shift, size=(1, 1, 3))
        img = np.clip(img, 0.0, 1.0)
        if was_uint8:
            img = np.round(img * 255.0).astype(np.uint8)
        return {**sample, "img": img}


def pad_annotations(annots: Sequence[np.ndarray], max_boxes: int) -> np.ndarray:
    """Stack per-image (N_i, 5) annotations into (B, max_boxes, 5), -1 padded.

    Like the reference collater (augmentation.py:69-91) but with a FIXED box
    budget so jitted programs never retrace. Overflowing boxes are dropped
    (largest-area first retained).
    """
    batch = np.full((len(annots), max_boxes, 5), -1.0, dtype=np.float32)
    for i, a in enumerate(annots):
        a = np.asarray(a, dtype=np.float32).reshape(-1, 5)
        if len(a) > max_boxes:
            areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
            a = a[np.argsort(-areas)[:max_boxes]]
        batch[i, :len(a)] = a
    return batch


def collate(samples: Sequence[dict], max_boxes: int = 100,
            uint8_images: bool = False) -> dict:
    """Batch samples -> {'images': (B,S,S,3) f32, 'annotations': (B,M,5) f32,
    'scales': (B,) f32} with static shapes.

    ``uint8_images=True`` emits the image batch as uint8 [0, 255] (for the
    device-normalize path): float [0,1] samples are re-quantized (lossless
    for 8-bit decodes), uint8 samples pass through untouched."""
    imgs = [s["img"] for s in samples]
    if uint8_images:
        imgs = [i if i.dtype == np.uint8
                else np.round(np.asarray(i, np.float32) * 255.0
                              ).astype(np.uint8) for i in imgs]
        images = np.stack(imgs)
    else:
        images = np.stack(imgs).astype(np.float32)
    annotations = pad_annotations([s["annot"] for s in samples], max_boxes)
    scales = np.array([s.get("scale", 1.0) for s in samples], dtype=np.float32)
    return {"images": images, "annotations": annotations, "scales": scales}


def train_transforms(size: int, flip_prob: float = 0.5,
                     photometric: bool = False,
                     seed: Optional[int] = None,
                     device_normalize: bool = False) -> Compose:
    """`device_normalize=True` omits the host Normalizer: images flow
    through flip/resize un-normalized (uint8 or [0,1] float) and the jitted
    step normalizes on device (train_lib.maybe_normalize_images keys off the
    uint8 dtype). Collated uint8 batches are 4x smaller on the host->device
    link — the big lever on tunneled/PCIe-bound rigs."""
    rng = np.random.RandomState(seed)
    ts: List[Callable] = []
    if photometric:
        ts.append(PhotometricAugmenter(rng=rng))
    ts += [] if device_normalize else [Normalizer()]
    ts += [Augmenter(flip_prob, rng=rng), Resizer(size)]
    return Compose(ts)


def eval_transforms(size: int, device_normalize: bool = False) -> Compose:
    if device_normalize:
        return Compose([Resizer(size)])
    return Compose([Normalizer(), Resizer(size)])
