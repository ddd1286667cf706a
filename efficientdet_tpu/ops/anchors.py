"""Anchor generation — computed once on the host, baked in as XLA constants.

The reference regenerates anchors with numpy on EVERY forward pass and uploads
them to the device (models/module.py:161-180) — a per-step host round-trip. On
TPU the input size is static under jit, so we precompute the anchor box tensor
once per (image_size, levels, ratios, scales) and let it constant-fold into the
compiled program.

Semantics match reference models/module.py:145-273 exactly:
  - pyramid levels P3..P7, stride 2^l, base size 2^(l+2)
  - 9 anchors/cell: ratios {0.5,1,2} (major) x scales {2^0,2^1/3,2^2/3} (minor)
  - cell centers at (i + 0.5) * stride
  - flattened order (y, x, anchor) per level, levels concatenated P3->P7 —
    which lines up with the head's (B,H,W,A,C) -> (B,HWA,C) reshape
    (reference models/retinahead.py:120-128).
Boxes are (x1, y1, x2, y2) in input-image pixels.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

DEFAULT_PYRAMID_LEVELS: Tuple[int, ...] = (3, 4, 5, 6, 7)
DEFAULT_RATIOS: Tuple[float, ...] = (0.5, 1.0, 2.0)
DEFAULT_SCALES: Tuple[float, ...] = (2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))


def generate_cell_anchors(base_size: float,
                          ratios: Sequence[float] = DEFAULT_RATIOS,
                          scales: Sequence[float] = DEFAULT_SCALES) -> np.ndarray:
    """(len(ratios)*len(scales), 4) zero-centered anchors for one cell.

    Row order is ratio-major / scale-minor (reference models/module.py:183-214):
    area is preserved per scale, then w = sqrt(area/ratio), h = w * ratio.
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    num = len(ratios) * len(scales)
    ws = base_size * np.tile(scales, len(ratios))          # pre-ratio side
    areas = ws * ws
    r = np.repeat(ratios, len(scales))
    w = np.sqrt(areas / r)
    h = w * r
    anchors = np.zeros((num, 4), dtype=np.float64)
    anchors[:, 0] = -w / 2
    anchors[:, 1] = -h / 2
    anchors[:, 2] = w / 2
    anchors[:, 3] = h / 2
    return anchors


def shift_anchors(feat_shape: Tuple[int, int], stride: int,
                  cell_anchors: np.ndarray) -> np.ndarray:
    """Tile cell anchors across a (H, W) grid; returns (H*W*A, 4), (y,x,a) order."""
    h, w = feat_shape
    shift_x = (np.arange(w) + 0.5) * stride
    shift_y = (np.arange(h) + 0.5) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)           # (h, w), y-major on ravel
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    out = cell_anchors[None, :, :] + shifts[:, None, :]
    return out.reshape(-1, 4)


def feature_shapes(image_size: int,
                   pyramid_levels: Sequence[int] = DEFAULT_PYRAMID_LEVELS):
    """Per-level (H, W) = ceil(image_size / 2^l) (reference models/module.py:163-166)."""
    return [((image_size + 2 ** l - 1) // 2 ** l,) * 2 for l in pyramid_levels]


@functools.lru_cache(maxsize=64)
def anchors_for_feature_shapes(
        shapes: Tuple[Tuple[int, int], ...],
        pyramid_levels: Tuple[int, ...] = DEFAULT_PYRAMID_LEVELS,
        ratios: Tuple[float, ...] = DEFAULT_RATIOS,
        scales: Tuple[float, ...] = DEFAULT_SCALES) -> np.ndarray:
    """Anchors for explicit per-level (H, W) grids, (A_total, 4) f32.

    The general entry point: `shapes` are the head's *actual* feature
    shapes, which at off-spec input sizes (e.g. the reference's broken
    D7@1636 — see models/layers.py upsample_nearest_to) differ from the
    ceil pyramid because of the backbone's nominal-size static-SAME
    padding quirk. `anchors_for_image_size` is the ceil-pyramid special
    case (identical at every production D0-D6 geometry)."""
    per_level = []
    for (fh, fw), level in zip(shapes, pyramid_levels):
        stride = 2 ** level
        base_size = 2 ** (level + 2)
        cell = generate_cell_anchors(base_size, ratios, scales)
        per_level.append(shift_anchors((fh, fw), stride, cell))
    out = np.concatenate(per_level, axis=0).astype(np.float32)
    out.setflags(write=False)
    return out


def anchors_for_image_size(
        image_size: int,
        pyramid_levels: Tuple[int, ...] = DEFAULT_PYRAMID_LEVELS,
        ratios: Tuple[float, ...] = DEFAULT_RATIOS,
        scales: Tuple[float, ...] = DEFAULT_SCALES) -> np.ndarray:
    """All anchors for a square input, (A_total, 4) float32, P3..P7 order."""
    shapes = tuple(feature_shapes(image_size, pyramid_levels))
    return anchors_for_feature_shapes(shapes, tuple(pyramid_levels),
                                      tuple(ratios), tuple(scales))


def num_anchors_for_image_size(
        image_size: int,
        pyramid_levels: Sequence[int] = DEFAULT_PYRAMID_LEVELS,
        anchors_per_cell: int = 9) -> int:
    return sum(h * w * anchors_per_cell
               for h, w in feature_shapes(image_size, pyramid_levels))
