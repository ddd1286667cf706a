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

import functools
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
    return (is_pos_class, attend, positive, num_positive, matched_gt, has_gt,
            assigned_label)


def _smooth_l1_elem(diff: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized elementwise smooth-L1, beta=1/9 (reference
    losses.py:141-145) — shared by the probability- and logits-form paths."""
    beta = 1.0 / 9.0
    return jnp.where(diff <= beta, 0.5 * 9.0 * diff ** 2, diff - 0.5 * beta)


def _smooth_l1(reg_preds: jnp.ndarray, reg_targets: jnp.ndarray,
               positive: jnp.ndarray, num_positive: jnp.ndarray
               ) -> jnp.ndarray:
    smooth_l1 = _smooth_l1_elem(jnp.abs(reg_targets - reg_preds))
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
     has_gt_b, _) = _match_anchors(anchors, annotations, num_classes)

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


def _focal_elem_terms(x: jnp.ndarray, assigned_label: jnp.ndarray,
                      positive: jnp.ndarray, alpha: float, gamma: float):
    """Shared fwd/bwd elementwise chain of the logits-form focal BCE.

    -> (t (A, C) bool one-hot of the assigned class on positives,
        s = 1 - p_t, sp = softplus(-z) = -log p_t, alpha_t) — all f32,
    rebuilt from the (A,) match vectors so neither pass ever stores an
    (A, C) float intermediate (the broadcast-compare fuses for free).
    """
    num_classes = x.shape[-1]
    t = positive[:, None] & (
        assigned_label[:, None] == jnp.arange(num_classes, dtype=jnp.int32))
    xf = x.astype(jnp.float32)
    neg_z = jnp.where(t, -xf, xf)
    s = jax.nn.sigmoid(neg_z)                  # 1 - p_t
    if gamma == 2.0:
        focal = s * s
    elif gamma == 1.0:
        focal = s
    else:
        focal = s ** gamma
    sp = jax.nn.softplus(neg_z)                # -log p_t
    alpha_t = jnp.where(t, alpha, 1.0 - alpha)
    return t, s, focal, sp, alpha_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _focal_cls_sum(cls_logits: jnp.ndarray,     # (A, C) pre-sigmoid
                   assigned_label: jnp.ndarray, # (A,) int32
                   positive: jnp.ndarray,       # (A,) bool
                   attend: jnp.ndarray,         # (A,) bool, not-ignored
                   alpha: float, gamma: float) -> jnp.ndarray:
    """Unnormalized focal-BCE sum with an ANALYTIC gradient (custom_vjp).

    Why not plain autodiff: JAX/XLA's vjp of the sigmoid/softplus chain
    keeps f32 (A, C) residuals alive between forward and backward — at
    D0@512 b64/80-class that is ~16 ms/step of HBM "loop fusion" traffic
    (tools/profile_step.py). ``jax.checkpoint`` over the loss re-runs the
    matching too and measured SLOWER (349.9 vs 376.0 img/s on v5e). The
    closed form needs only the bf16 logits plus three (A,) match vectors
    as residuals; the backward is one fused elementwise pass:

        d elem / d z = -alpha_t * s^gamma * (gamma * (1-s) * sp + s),
        z = t ? x : -x,  s = sigmoid(-z),  sp = softplus(-z)

    (derivation: ds/dz = -s(1-s), dsp/dz = -s, product rule on s^gamma*sp).
    Reference semantics unchanged from losses.py:86-104 (verified against
    the p_t-form and by finite differences in tests/test_ops.py).

    CONSTRAINT: ``jax.custom_vjp`` makes this reverse-mode-only — jax.jvp /
    jax.jacfwd / forward-over-reverse HVPs through the training loss will
    raise. Training only needs grad (reverse); if forward-mode is ever
    required, switch to ``jax.custom_jvp`` (the closed form above transposes
    directly) or fall back to ``focal_loss`` / ``focal_loss_from_logits``,
    which remain plain-autodiff.
    """
    _, _, focal, sp, alpha_t = _focal_elem_terms(
        cls_logits, assigned_label, positive, alpha, gamma)
    elem = alpha_t * focal * sp
    return jnp.sum(jnp.where(attend[:, None], elem, 0.0))


def _focal_cls_sum_fwd(cls_logits, assigned_label, positive, attend,
                       alpha, gamma):
    out = _focal_cls_sum(cls_logits, assigned_label, positive, attend,
                         alpha, gamma)
    return out, (cls_logits, assigned_label, positive, attend)


def _focal_cls_sum_bwd(alpha, gamma, res, g):
    cls_logits, assigned_label, positive, attend = res
    t, s, focal, sp, alpha_t = _focal_elem_terms(
        cls_logits, assigned_label, positive, alpha, gamma)
    d_elem_dz = -alpha_t * focal * (gamma * (1.0 - s) * sp + s)
    dz_dx = jnp.where(t, 1.0, -1.0)
    dx = jnp.where(attend[:, None], d_elem_dz * dz_dx, 0.0) * g
    return (dx.astype(cls_logits.dtype), None, None, None)


_focal_cls_sum.defvjp(_focal_cls_sum_fwd, _focal_cls_sum_bwd)


def _per_image_logit_sums(
        cls_logits: jnp.ndarray,     # (A, C) pre-sigmoid, any float dtype
        reg_preds: jnp.ndarray,      # (A, 4)
        anchors: jnp.ndarray,        # (A, 4)
        annotations: jnp.ndarray,    # (M, 5), -1 padded
        alpha: float,
        gamma: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """UNNORMALIZED logits-form focal/smooth-L1 partial sums for one image
    over one set of anchors -> (cls_sum, reg_sum, num_positive).

    Anchor assignment is independent per anchor and the reference normalizes
    per IMAGE (sum / num_positives, losses.py:104,148), so the loss
    decomposes exactly over any partition of the anchor set — in particular
    over pyramid levels, which is the training hot path
    (``focal_loss_from_level_logits``): summing per level and normalizing
    once reproduces the concatenated computation bit-for-bit up to fp
    reassociation.

    The focal BCE is expressed directly on logits:

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
    (_, attend, positive, num_positive, matched_gt,
     _, assigned_label) = _match_anchors(anchors, annotations, num_classes)

    cls_sum = _focal_cls_sum(cls_logits, assigned_label, positive, attend,
                             alpha, gamma)

    reg_targets = box_ops.encode_boxes(anchors, matched_gt)
    smooth_l1 = _smooth_l1_elem(
        jnp.abs(reg_targets - reg_preds.astype(jnp.float32)))
    reg_sum = jnp.sum(smooth_l1 * positive.astype(jnp.float32)[:, None])
    return cls_sum, reg_sum, num_positive


def _per_image_losses_from_logits(
        cls_logits: jnp.ndarray,     # (A, C) pre-sigmoid, any float dtype
        reg_preds: jnp.ndarray,      # (A, 4)
        anchors: jnp.ndarray,        # (A, 4)
        annotations: jnp.ndarray,    # (M, 5), -1 padded
        alpha: float,
        gamma: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Logits-form focal loss over the full anchor set — normalized
    (cls_loss, reg_loss) for one image. See ``_per_image_logit_sums``."""
    cls_sum, reg_sum, num_positive = _per_image_logit_sums(
        cls_logits, reg_preds, anchors, annotations, alpha, gamma)
    pos_f = num_positive.astype(jnp.float32)
    cls_loss = cls_sum / jnp.maximum(pos_f, 1.0)
    reg_loss = reg_sum / jnp.maximum(4.0 * pos_f, 1.0)
    has_gt = jnp.any(annotations[:, 4] != -1).astype(cls_loss.dtype)
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
    """Batched logits-form detection loss on CONCATENATED (B, A, C) head
    outputs; see ``_per_image_losses_from_logits``. Prefer
    ``focal_loss_from_level_logits`` in the train step — identical numbers
    without ever materializing the concatenated tensor."""
    cls_l, reg_l = jax.vmap(
        lambda c, r, a: _per_image_losses_from_logits(
            c, r, anchors, a, alpha, gamma)
    )(cls_logits, reg_preds, annotations)
    return jnp.mean(cls_l), jnp.mean(reg_l)


def focal_loss_from_level_logits(
        cls_levels,                  # list of (B, A_l, C) pre-sigmoid
        reg_levels,                  # list of (B, A_l, 4)
        anchor_levels,               # list of (A_l, 4)
        annotations: jnp.ndarray,    # (B, M, 5), -1 padded
        alpha: float = 0.25,
        gamma: float = 2.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched detection loss on PER-LEVEL head outputs — the training hot
    path.

    Numerically identical to ``focal_loss_from_logits`` on the concatenated
    tensors (anchor assignment is per-anchor independent; normalization is
    per image — see ``_per_image_logit_sums``), but the (B, A_total, C)
    concatenation never exists: each level's logits are consumed in the
    head conv's native layout. On v5e at D0@512 b64/80-class the concat
    machinery (per-level tiled-layout relayout copies + dynamic-update-slice
    forward, slices backward: XLA "data formatting") costs ~10 ms of a
    168 ms step — this formulation eliminates it (tools/profile_step.py,
    docs/DESIGN.md train-profile table).
    """
    if not (len(cls_levels) == len(reg_levels) == len(anchor_levels)):
        raise ValueError(
            "focal_loss_from_level_logits: per-level lists must align — got "
            f"{len(cls_levels)} cls / {len(reg_levels)} reg / "
            f"{len(anchor_levels)} anchor levels (a silent zip would drop "
            "the extra levels from the loss)")
    cls_sums, reg_sums, pos_counts = 0.0, 0.0, 0
    for cls_l, reg_l, anchors_l in zip(cls_levels, reg_levels, anchor_levels):
        c, r, p = jax.vmap(
            lambda c_, r_, a_, al=anchors_l: _per_image_logit_sums(
                c_, r_, al, a_, alpha, gamma)
        )(cls_l, reg_l, annotations)
        cls_sums = cls_sums + c
        reg_sums = reg_sums + r
        pos_counts = pos_counts + p
    pos_f = pos_counts.astype(jnp.float32)
    cls_loss = cls_sums / jnp.maximum(pos_f, 1.0)
    reg_loss = reg_sums / jnp.maximum(4.0 * pos_f, 1.0)
    has_gt = jnp.any(annotations[:, :, 4] != -1, axis=1)
    has_gt = has_gt.astype(cls_loss.dtype)
    return jnp.mean(cls_loss * has_gt), jnp.mean(reg_loss * has_gt)
