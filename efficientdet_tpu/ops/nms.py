"""Fixed-shape, on-device NMS and detection post-processing.

The reference delegates suppression to ``torchvision.ops.nms`` (C++/CUDA,
models/efficientdet.py:82) after a dynamic boolean filter, and only supports
batch size 1 (indexing ``[0, ...]`` at efficientdet.py:73-86). Neither pattern
compiles on TPU: data-dependent shapes force host round-trips and retraces.

TPU formulation:
  1. class-agnostic score = max over classes (same as reference, eval mode)
  2. ``lax.top_k`` selects a fixed ``pre_nms_top_k`` candidate set
  3. greedy suppression with NO dynamic shapes, two interchangeable
     formulations producing identical results:
     - 'select' (default, fast): a ``max_detections``-step scan; each step
       argmaxes the remaining scores, emits that box, and suppresses its
       overlaps — O(D) sequential steps, O(K) memory
     - 'mask': a K-step scan over the K x K IoU matrix maintaining a kept
       mask — the literal greedy recurrence, kept for testing
  4. results are packed to a fixed ``max_detections`` budget with a
     validity mask.

The whole image->detections path therefore stays on device and is batchable
(vmap) — fixing the reference's batch-1 limitation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import boxes as box_ops


class Detections(NamedTuple):
    """Fixed-shape detection results; invalid slots have score -1, class -1."""

    scores: jnp.ndarray   # (..., max_detections)
    classes: jnp.ndarray  # (..., max_detections) int32
    boxes: jnp.ndarray    # (..., max_detections, 4)
    valid: jnp.ndarray    # (..., max_detections) bool


def greedy_suppression_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                            iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-sorted candidates.

    `boxes` (K, 4) MUST already be sorted by descending score; `scores` is used
    only to invalidate padding/below-threshold entries (score <= 0 is dropped).
    Returns a bool (K,) mask identical to sequential greedy NMS.
    """
    k = boxes.shape[0]
    iou = box_ops.pairwise_iou(boxes, boxes)              # (K, K)
    candidate = scores > 0.0

    def step(kept, row):
        iou_row, idx, is_candidate = row
        # kept[idx] is true iff no earlier kept box suppresses idx.
        keep_this = is_candidate & kept[idx]
        # Suppress later boxes overlapping this one (only if we keep it).
        suppress = keep_this & (iou_row > iou_threshold)
        later = jnp.arange(k) > idx
        kept = kept & ~(suppress & later)
        return kept, keep_this

    rows = (iou, jnp.arange(k), candidate)
    kept_final, keep_flags = jax.lax.scan(step, jnp.ones(k, dtype=bool), rows)
    del kept_final
    return keep_flags


def select_and_suppress(boxes: jnp.ndarray, scores: jnp.ndarray,
                        classes: jnp.ndarray, iou_threshold: float,
                        max_detections: int) -> Detections:
    """Greedy NMS as a `max_detections`-step select-and-suppress scan.

    Identical results to the keep-mask formulation, but O(D) sequential steps
    (D = detection budget, typically 100) instead of O(K) (K = candidate
    pool, typically 1000), and O(K) memory per step instead of a K x K IoU
    matrix — the performance-critical path for serving (measured ~5x faster
    at K=1000, D=100 on v5e).

    Each step: argmax of the remaining scores -> emit -> suppress everything
    with IoU > threshold (including itself). Entries with score <= 0 are
    padding and never emitted.
    """
    k = boxes.shape[0]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)

    def step(remaining, _):
        idx = jnp.argmax(remaining)
        score = remaining[idx]
        valid = score > 0.0
        box = boxes[idx]
        iw = (jnp.minimum(box[2], boxes[:, 2])
              - jnp.maximum(box[0], boxes[:, 0]))
        ih = (jnp.minimum(box[3], boxes[:, 3])
              - jnp.maximum(box[1], boxes[:, 1]))
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        box_area = jnp.maximum(box[2] - box[0], 0.0) * \
            jnp.maximum(box[3] - box[1], 0.0)
        iou = inter / jnp.maximum(area + box_area - inter, 1e-8)
        suppress = (iou > iou_threshold) | (
            jnp.arange(k) == idx)  # self always leaves the pool
        remaining = jnp.where(valid & suppress, 0.0, remaining)
        return remaining, (score, idx, valid)

    _, (out_scores, out_idx, out_valid) = jax.lax.scan(
        step, jnp.maximum(scores, 0.0), None, length=max_detections)
    det_boxes = boxes[out_idx]
    det_classes = classes[out_idx]
    return Detections(
        scores=jnp.where(out_valid, out_scores, -1.0),
        classes=jnp.where(out_valid, det_classes, -1),
        boxes=jnp.where(out_valid[:, None], det_boxes, 0.0),
        valid=out_valid,
    )


def _nms_single(cls_probs: jnp.ndarray,     # (A, C)
                decoded_boxes: jnp.ndarray,  # (A, 4)
                score_threshold: float,
                iou_threshold: float,
                pre_nms_top_k: int,
                max_detections: int,
                method: str = "select") -> Detections:
    num_anchors, num_classes = cls_probs.shape
    scores = jnp.max(cls_probs, axis=1)                   # class-agnostic
    # Zero-out below-threshold anchors before top-k so they become padding.
    scores = jnp.where(scores > score_threshold, scores, 0.0)

    k = min(pre_nms_top_k, num_anchors)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = decoded_boxes[top_idx]
    top_classes = jnp.argmax(cls_probs[top_idx], axis=1).astype(jnp.int32)

    if method == "select":
        return select_and_suppress(top_boxes, top_scores, top_classes,
                                   iou_threshold, max_detections)

    keep = greedy_suppression_mask(top_boxes, top_scores, iou_threshold)
    # Re-pack the kept entries to the fixed detection budget. Kept entries are
    # already in score order; sort the keep mask (stable) to pull them first.
    ranked = jnp.where(keep, top_scores, -1.0)
    det_scores, order = jax.lax.top_k(ranked, max_detections)
    det_boxes = top_boxes[order]
    det_classes = top_classes[order]
    valid = det_scores > 0.0
    return Detections(
        scores=jnp.where(valid, det_scores, -1.0),
        classes=jnp.where(valid, det_classes, -1),
        boxes=jnp.where(valid[:, None], det_boxes, 0.0),
        valid=valid,
    )


def batched_nms(cls_probs: jnp.ndarray,      # (B, A, C)
                decoded_boxes: jnp.ndarray,  # (B, A, 4)
                score_threshold: float = 0.01,
                iou_threshold: float = 0.5,
                pre_nms_top_k: int = 1000,
                max_detections: int = 100,
                method: str = "select") -> Detections:
    """Batched fixed-shape NMS; see module docstring.

    method='select' (default): D-step select-and-suppress scan, the fast
    serving path. method='mask': K-step keep-mask scan over the K x K IoU
    matrix; same results, kept as the reference formulation for testing.
    """
    return jax.vmap(
        lambda c, b: _nms_single(c, b, score_threshold, iou_threshold,
                                 pre_nms_top_k, max_detections, method)
    )(cls_probs, decoded_boxes)


def batched_nms_from_deltas(cls_probs: jnp.ndarray,   # (B, A, C)
                            box_deltas: jnp.ndarray,  # (B, A, 4)
                            anchors: jnp.ndarray,     # (A, 4)
                            image_height: int, image_width: int,
                            score_threshold: float = 0.01,
                            iou_threshold: float = 0.5,
                            pre_nms_top_k: int = 1000,
                            max_detections: int = 100,
                            approx_topk: bool = False) -> Detections:
    """The serving-optimized postprocess: identical results to
    decode-all -> clip -> `batched_nms`, restructured for TPU bandwidth:

    - class max AND argmax are taken over the full (B, A, C) prob tensor in
      one fused pass; only (B, A) score/class vectors survive — the naive
      order (top-k first, then gather the (B, K, C) probs and argmax) re-reads
      the full prob tensor through a gather, which measured ~10 ms at
      B=128/A=49k on v5e vs ~2 ms for the fused reductions
    - box decode + clip run AFTER candidate selection on (B, K, 4) instead of
      (B, A, 4) — 50x fewer anchors at K=1000, A=49k
    - `approx_topk=True` swaps `lax.top_k` for TPU-optimized
      `lax.approx_max_k` (~2.7x faster selection, >=95% recall on the
      candidate set; disabled by default to keep exact reference parity)

    Suppression itself is the same select-and-suppress scan.
    """
    scores_all = jnp.max(cls_probs, axis=2)
    classes_all = jnp.argmax(cls_probs, axis=2).astype(jnp.int32)
    return batched_nms_from_scores(
        scores_all, classes_all, box_deltas, anchors,
        image_height, image_width, score_threshold=score_threshold,
        iou_threshold=iou_threshold, pre_nms_top_k=pre_nms_top_k,
        max_detections=max_detections, approx_topk=approx_topk)


def _packed_topk(scores: jnp.ndarray, k: int):
    """Top-k candidate selection as ONE u32 sort instead of lax.top_k's full
    (f32 key, s32 iota) pair sort — half the sort traffic.

    Packs the high 16 bits of each non-negative f32 score (IEEE bit pattern
    is order-preserving for non-negative floats; inputs are clamped to >= 0
    to keep that precondition) with ``0xFFFF - index`` in the low 16 bits,
    so a single integer sort yields score-descending, index-ascending
    (stable) order. Scores are returned EXACT (gathered by index); only
    membership at the k-th-rank boundary can differ from exact top-k, for
    candidates whose scores agree in their top 16 bits. Truncating f32 to
    its high 16 bits keeps 7 mantissa bits, i.e. candidates within a 2^-7
    (~0.8%) relative gap of the boundary score can tie — noise-level for
    detection, since rank-k candidates face NMS and a 100-detection budget
    anyway, but NOT bit-identical to exact top-k in those tie cases.

    A > 65536 (D1-D7 anchor counts) is handled hierarchically: per-chunk
    packed sorts of 65536 anchors, then an exact lax.top_k merge of the
    (num_chunks * k) survivors — exact top-k of each chunk contains the
    global top-k members from that chunk, so the union is sufficient.
    """
    # u32 bit-pattern order breaks for negative floats (they'd sort above
    # all positives); clamp rather than trust the caller's thresholding.
    scores = jnp.maximum(scores, 0.0)
    b, a = scores.shape
    chunk = 0x10000

    def onechunk(sc, base):
        n = sc.shape[1]
        bits = jax.lax.bitcast_convert_type(sc.astype(jnp.float32),
                                            jnp.uint32)
        idx = jnp.arange(n, dtype=jnp.uint32)
        packed = (bits & jnp.uint32(0xFFFF0000)) | (jnp.uint32(0xFFFF) - idx)
        kk = min(k, n)
        top = jax.lax.sort(packed, dimension=1, is_stable=False)[:, n - kk:]
        top = top[:, ::-1]
        local = (jnp.uint32(0xFFFF) - (top & jnp.uint32(0xFFFF))
                 ).astype(jnp.int32)
        return local + base

    if a <= chunk:
        top_idx = onechunk(scores, 0)
        top_scores = jnp.take_along_axis(scores, top_idx, axis=1)
        return top_scores, top_idx

    pad = (-a) % chunk
    padded = jnp.pad(scores, ((0, 0), (0, pad)))
    g = padded.shape[1] // chunk
    chunks = padded.reshape(b, g, chunk)
    cand_idx = jnp.concatenate(
        [onechunk(chunks[:, i], i * chunk) for i in range(g)], axis=1)
    # gather from the PADDED scores so tail-padding candidates keep score 0
    # (they can only surface when < k real candidates exist; score 0 is
    # never emitted downstream). Clamp indices afterwards for box gathers.
    cand_scores = jnp.take_along_axis(padded, cand_idx, axis=1)
    top_scores, sel = jax.lax.top_k(cand_scores, k)  # small exact merge
    top_idx = jnp.minimum(jnp.take_along_axis(cand_idx, sel, axis=1), a - 1)
    return top_scores, top_idx


def batched_nms_from_scores(scores_all: jnp.ndarray,   # (B, A)
                            classes_all: jnp.ndarray,  # (B, A) int32
                            box_deltas: jnp.ndarray,   # (B, A, 4)
                            anchors: jnp.ndarray,      # (A, 4)
                            image_height: int, image_width: int,
                            score_threshold: float = 0.01,
                            iou_threshold: float = 0.5,
                            pre_nms_top_k: int = 1000,
                            max_detections: int = 100,
                            approx_topk: bool = False,
                            method: str = "auto") -> Detections:
    """NMS tail for pre-reduced per-anchor (score, class) vectors.

    The fastest serving shape: pair with the model's ``serving_forward``,
    which does the class max/argmax per level inside the head (on logits —
    sigmoid is monotonic) so no (B, A, C) tensor ever reaches HBM.

    method: 'pallas' (VMEM-resident greedy kernel, kernels/nms_kernel.py),
    'select' (lax.scan formulation), or 'auto' — pallas on TPU backends,
    scan elsewhere. The suppression logic is identical; the pallas path
    selects candidates with ``_packed_topk``, whose MEMBERSHIP at the
    k-th-rank boundary is approximate (see its docstring): when candidates
    near rank k agree in their top 16 score bits, 'auto' can emit different
    boundary detections on TPU vs CPU. Pass method='select' (exact
    lax.top_k) when strict cross-backend determinism matters.
    """
    num_anchors = scores_all.shape[1]
    k = min(pre_nms_top_k, num_anchors)
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "select"

    scores_all = jnp.where(scores_all > score_threshold,
                           scores_all.astype(jnp.float32), 0.0)

    if approx_topk:
        top_scores, top_idx = jax.lax.approx_max_k(scores_all, k)
    elif method == "pallas":
        top_scores, top_idx = _packed_topk(scores_all, k)
    else:
        top_scores, top_idx = jax.lax.top_k(scores_all, k)

    if method == "pallas":
        from ..kernels.nms_kernel import nms_select_pallas
        top_deltas = jnp.take_along_axis(
            box_deltas.astype(jnp.float32), top_idx[..., None], axis=1)
        top_boxes = box_ops.decode_boxes(anchors[top_idx], top_deltas)
        top_boxes = box_ops.clip_boxes(top_boxes, image_height, image_width)
        top_classes = jnp.take_along_axis(classes_all, top_idx, axis=1)
        out_s, out_i = nms_select_pallas(top_scores, top_boxes,
                                         iou_threshold, max_detections)
        valid = out_s > 0.0
        det_boxes = jnp.take_along_axis(top_boxes, out_i[..., None], axis=1)
        det_classes = jnp.take_along_axis(top_classes, out_i, axis=1)
        return Detections(
            scores=jnp.where(valid, out_s, -1.0),
            classes=jnp.where(valid, det_classes, -1),
            boxes=jnp.where(valid[..., None], det_boxes, 0.0),
            valid=valid)

    def finish(scores_i, idx_i, deltas_i, classes_i):
        top_boxes = box_ops.decode_boxes(
            anchors[idx_i], deltas_i[idx_i].astype(jnp.float32))
        top_boxes = box_ops.clip_boxes(top_boxes, image_height, image_width)
        return select_and_suppress(top_boxes, scores_i, classes_i[idx_i],
                                   iou_threshold, max_detections)

    return jax.vmap(finish)(top_scores, top_idx, box_deltas, classes_all)
