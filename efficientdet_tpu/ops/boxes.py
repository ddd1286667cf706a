"""Box geometry: IoU, encode/decode, clipping. Pure jnp, fixed shapes.

Replaces the reference's ``calc_iou`` (models/losses.py:6-26), ``BBoxTransform``
(models/module.py:9-49) and ``ClipBoxes`` (models/module.py:52-67). All
functions are batched-friendly (vmap/jit) and dtype-polymorphic.

Box convention: (x1, y1, x2, y2); deltas: (dx, dy, dw, dh) normalized by
BOX_STD = (0.1, 0.1, 0.2, 0.2), the RetinaNet convention shared by the
reference's loss (losses.py:136) and decoder (module.py:30-36).
"""

from __future__ import annotations

import jax.numpy as jnp

BOX_STD = (0.1, 0.1, 0.2, 0.2)


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (A, 4) and (M, 4) boxes -> (A, M).

    Matches reference models/losses.py:6-26: no +1 area convention, union
    clamped to >= 1e-8. Degenerate boxes yield IoU 0.
    """
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    iw = (jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
          - jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0]))
    ih = (jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
          - jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1]))
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    union = jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-8)
    return inter / union


def boxes_to_centers(boxes: jnp.ndarray):
    """(..., 4) x1y1x2y2 -> (ctr_x, ctr_y, w, h) tuple."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                 std=BOX_STD) -> jnp.ndarray:
    """Regression targets for matched (anchor, gt) pairs, (..., 4).

    Matches reference models/losses.py:116-136: gt w/h clamped to >= 1 before
    the log, then normalized by std.
    """
    acx, acy, aw, ah = boxes_to_centers(anchors)
    gcx, gcy, gw, gh = boxes_to_centers(gt_boxes)
    gw = jnp.maximum(gw, 1.0)
    gh = jnp.maximum(gh, 1.0)
    # recompute centers from original corners (reference uses original centers,
    # clamping only affects the log terms)
    dx = (gcx - acx) / aw
    dy = (gcy - acy) / ah
    dw = jnp.log(gw / aw)
    dh = jnp.log(gh / ah)
    out = jnp.stack([dx, dy, dw, dh], axis=-1)
    return out / jnp.asarray(std, dtype=out.dtype)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 std=BOX_STD) -> jnp.ndarray:
    """Apply predicted deltas to anchors -> (..., 4) x1y1x2y2.

    Matches reference BBoxTransform (models/module.py:24-49).
    """
    acx, acy, aw, ah = boxes_to_centers(anchors)
    std = jnp.asarray(std, dtype=deltas.dtype)
    dx = deltas[..., 0] * std[0]
    dy = deltas[..., 1] * std[1]
    dw = deltas[..., 2] * std[2]
    dh = deltas[..., 3] * std[3]
    pcx = acx + dx * aw
    pcy = acy + dy * ah
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def clip_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Clamp boxes to the image (reference ClipBoxes, models/module.py:52-67).

    The reference clamps only x1/y1 at 0 and x2/y2 at width/height; we keep
    that exact behavior for output parity.
    """
    x1 = jnp.maximum(boxes[..., 0], 0.0)
    y1 = jnp.maximum(boxes[..., 1], 0.0)
    x2 = jnp.minimum(boxes[..., 2], float(width))
    y2 = jnp.minimum(boxes[..., 3], float(height))
    return jnp.stack([x1, y1, x2, y2], axis=-1)
