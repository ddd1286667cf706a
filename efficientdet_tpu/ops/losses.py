"""Focal classification loss + smooth-L1 box regression with anchor matching.

TPU-first reformulation of the reference ``FocalLoss`` (models/losses.py:29-152):
the reference loops over the batch in Python with boolean fancy indexing — a
host-serialized, dynamic-shape pattern. Here the whole computation is a single
fixed-shape expression vmapped over the batch, so XLA fuses it into the
backward pass with no host sync.

Semantics matched exactly (verified by tests against a numpy oracle):
  - annotations are (B, M, 5) [x1,y1,x2,y2,label], padded with -1 rows
    (reference datasets/augmentation.py:80; sentinel filter losses.py:52)
  - anchor assignment by IoU max over valid GT: < 0.4 negative, >= 0.5
    positive (one-hot of the argmax GT's label), in-between ignored
    (losses.py:74-84)
  - focal BCE, alpha=0.25 gamma=2, probabilities clamped to [1e-4, 1-1e-4],
    sum normalized by max(num_positives, 1) (losses.py:60,86-104)
  - smooth-L1 (beta=1/9) on std-normalized deltas, mean over positive
    anchors x 4 coords (losses.py:108-148)
  - an image with zero valid GT contributes 0 to both losses (losses.py:54-58)
  - final losses are means over the batch (losses.py:152)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import boxes as box_ops


def _match_anchors(anchors: jnp.ndarray,       # (A, 4)
                   annotations: jnp.ndarray,   # (M, 5), -1 padded
                   num_classes: int):
    """IoU anchor assignment shared by both focal formulations.

    Returns (is_pos_class (A, C) bool, attend (A,) bool, positive (A,) bool,
    num_positive scalar, matched_gt (A, 4), has_gt scalar-bool-as-needed).
    """
    gt_boxes = annotations[:, :4]
    gt_labels = annotations[:, 4]
    valid = gt_labels != -1                                   # (M,)
    num_valid = jnp.sum(valid)

    # IoU against valid GT only: invalid columns forced below any real IoU so
    # argmax never selects them when a valid GT exists.
    iou = box_ops.pairwise_iou(anchors, gt_boxes)             # (A, M)
    iou = jnp.where(valid[None, :], iou, -1.0)
    iou_max = jnp.max(iou, axis=1)                            # (A,)
    iou_argmax = jnp.argmax(iou, axis=1)                      # (A,)
    # One-hot of the assigned GT per anchor. Used instead of fancy-indexing
    # gathers (gt_boxes[iou_argmax]): a (A,)-element gather from an M-row
    # table lowers to a scalar-access gather on TPU (~45 ms/step at B=64 in
    # the backward re-computation); the (A, M) one-hot contraction is a
    # vector op costing ~nothing since M is the small padded box budget.
    assign_onehot = (iou_argmax[:, None] ==
                     jnp.arange(gt_boxes.shape[0])[None, :])  # (A, M) bool

    positive = iou_max >= 0.5
    negative = iou_max < 0.4
    num_positive = jnp.sum(positive)

    assigned_label_f = jnp.sum(
        jnp.where(assign_onehot, gt_labels[None, :], 0.0), axis=1)
    assigned_label = jnp.clip(assigned_label_f, 0,
                              num_classes - 1).astype(jnp.int32)
    # boolean one-hot of the assigned class, zeroed for non-positives
    is_pos_class = positive[:, None] & (
        assigned_label[:, None] == jnp.arange(num_classes, dtype=jnp.int32))
    attend = positive | negative                              # (A,) not-ignored

    matched_gt = jnp.sum(
        jnp.where(assign_onehot[:, :, None], gt_boxes[None, :, :], 0.0),
        axis=1)                                               # (A, 4)
    has_gt = num_valid > 0
    return is_pos_class, attend, positive, num_positive, matched_gt, has_gt


def _smooth_l1(reg_preds: jnp.ndarray, reg_targets: jnp.ndarray,
               positive: jnp.ndarray, num_positive: jnp.ndarray
               ) -> jnp.ndarray:
    diff = jnp.abs(reg_targets - reg_preds)
    beta = 1.0 / 9.0
    smooth_l1 = jnp.where(diff <= beta, 0.5 * 9.0 * diff ** 2,
                          diff - 0.5 * beta)
    pos_f = positive.astype(smooth_l1.dtype)[:, None]
    return jnp.sum(smooth_l1 * pos_f) / jnp.maximum(
        4.0 * num_positive.astype(smooth_l1.dtype), 1.0)


def _per_image_losses(cls_probs: jnp.ndarray,      # (A, C) sigmoid probabilities
                      reg_preds: jnp.ndarray,      # (A, 4)
                      anchors: jnp.ndarray,        # (A, 4)
                      annotations: jnp.ndarray,    # (M, 5), -1 padded
                      alpha: float,
                      gamma: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    num_classes = cls_probs.shape[-1]
    (is_pos_class, attend, positive, num_positive, matched_gt,
     has_gt_b) = _match_anchors(anchors, annotations, num_classes)

    # --- classification: focal BCE on one-hot targets --------------------
    # Written in the p_t formulation: with one-hot targets t in {0,1},
    #   bce  = -(t log p + (1-t) log(1-p))  ==  -log(p_t),  p_t = t?p:1-p
    #   w    = (t ? 1-p : p)^gamma          ==  (1-p_t)^gamma
    # so ONE transcendental (log) per element instead of two, and the pow
    # becomes plain multiplies when gamma is a small integer (it is a Python
    # float at trace time, so the choice is static). Same math as the
    # reference losses.py:86-104, ~2x fewer VPU transcendentals.
    p = jnp.clip(cls_probs, 1e-4, 1.0 - 1e-4)
    pt = jnp.where(is_pos_class, p, 1.0 - p)
    alpha_factor = jnp.where(is_pos_class, alpha, 1.0 - alpha)
    one_minus_pt = 1.0 - pt
    if gamma == 2.0:
        focal = one_minus_pt * one_minus_pt
    elif gamma == 1.0:
        focal = one_minus_pt
    else:
        focal = one_minus_pt ** gamma
    cls_elem = alpha_factor * focal * -jnp.log(pt)
    cls_loss = jnp.where(attend[:, None], cls_elem, 0.0)
    cls_loss = jnp.sum(cls_loss) / jnp.maximum(num_positive.astype(p.dtype), 1.0)

    # --- regression: smooth-L1 on positives ------------------------------
    reg_targets = box_ops.encode_boxes(anchors, matched_gt)   # (A, 4)
    reg_loss = _smooth_l1(reg_preds, reg_targets, positive, num_positive)

    # zero GT -> both losses zero; zero positives -> reg loss zero (already).
    has_gt = has_gt_b.astype(cls_loss.dtype)
    return cls_loss * has_gt, reg_loss * has_gt


def _per_image_losses_from_logits(
        cls_logits: jnp.ndarray,     # (A, C) pre-sigmoid, any float dtype
        reg_preds: jnp.ndarray,      # (A, 4)
        anchors: jnp.ndarray,        # (A, 4)
        annotations: jnp.ndarray,    # (M, 5), -1 padded
        alpha: float,
        gamma: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Logits-form focal loss — the TRAINING hot path.

    Same assignment/normalization semantics as ``_per_image_losses`` but the
    focal BCE is expressed directly on logits:

        z        = t ? x : -x          (flip sign for the negative class)
        log(p_t) = log_sigmoid(z) = -softplus(-z)
        1 - p_t  = sigmoid(-z)
        elem     = alpha_t * sigmoid(-z)^gamma * softplus(-z)

    Wins over the probability form (reference losses.py:86-104):
      - numerically stable for any logit — no clip(1e-4) saturation plateau,
        gradients flow even when the reference form would clamp
      - the head's bf16 logits feed straight in; the f32 upcast fuses into
        this elementwise kernel, so only bf16 bytes cross HBM (the f32
        (B, A, C) sigmoid tensor of the probability path — ~1 GB/step at
        B=64/A=49k/C=80 written + re-read in the backward — never exists)
      - one transcendental pair (exp inside softplus/sigmoid share the
        rescaled exponent) per element, fused by XLA into a single VPU pass.

    Matches ``_per_image_losses`` exactly (up to fp error) wherever the
    probability form's clip is inactive, i.e. |x| < logit(1-1e-4) ~ 9.21.
    """
    num_classes = cls_logits.shape[-1]
    (is_pos_class, attend, positive, num_positive, matched_gt,
     has_gt_b) = _match_anchors(anchors, annotations, num_classes)

    x = cls_logits.astype(jnp.float32)
    z = jnp.where(is_pos_class, x, -x)
    neg_z = -z
    one_minus_pt = jax.nn.sigmoid(neg_z)
    if gamma == 2.0:
        focal = one_minus_pt * one_minus_pt
    elif gamma == 1.0:
        focal = one_minus_pt
    else:
        focal = one_minus_pt ** gamma
    alpha_factor = jnp.where(is_pos_class, alpha, 1.0 - alpha)
    cls_elem = alpha_factor * focal * jax.nn.softplus(neg_z)
    cls_loss = jnp.where(attend[:, None], cls_elem, 0.0)
    cls_loss = jnp.sum(cls_loss) / jnp.maximum(
        num_positive.astype(jnp.float32), 1.0)

    reg_targets = box_ops.encode_boxes(anchors, matched_gt)
    reg_loss = _smooth_l1(reg_preds.astype(jnp.float32), reg_targets,
                          positive, num_positive)

    has_gt = has_gt_b.astype(cls_loss.dtype)
    return cls_loss * has_gt, reg_loss * has_gt


def focal_loss(cls_probs: jnp.ndarray,      # (B, A, C)
               reg_preds: jnp.ndarray,      # (B, A, 4)
               anchors: jnp.ndarray,        # (A, 4)
               annotations: jnp.ndarray,    # (B, M, 5)
               alpha: float = 0.25,
               gamma: float = 2.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched detection loss -> (cls_loss, reg_loss) scalars (batch means)."""
    cls_l, reg_l = jax.vmap(
        lambda c, r, a: _per_image_losses(c, r, anchors, a, alpha, gamma)
    )(cls_probs, reg_preds, annotations)
    return jnp.mean(cls_l), jnp.mean(reg_l)


def focal_loss_from_logits(cls_logits: jnp.ndarray,  # (B, A, C), bf16 ok
                           reg_preds: jnp.ndarray,   # (B, A, 4), bf16 ok
                           anchors: jnp.ndarray,     # (A, 4)
                           annotations: jnp.ndarray, # (B, M, 5)
                           alpha: float = 0.25,
                           gamma: float = 2.0
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched logits-form detection loss (the training hot path); see
    ``_per_image_losses_from_logits`` for why this beats the probability
    form on TPU."""
    cls_l, reg_l = jax.vmap(
        lambda c, r, a: _per_image_losses_from_logits(
            c, r, anchors, a, alpha, gamma)
    )(cls_logits, reg_preds, annotations)
    return jnp.mean(cls_l), jnp.mean(reg_l)
