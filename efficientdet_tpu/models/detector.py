"""EfficientDet assembly: backbone -> BiFPN -> RetinaHead, plus the pure
train-loss and detection post-processing entry points.

Parity with reference models/efficientdet.py:22-100, redesigned functionally:
the reference's dual-mode ``forward`` (training returns losses, eval runs NMS,
batch-1 only) becomes a pure model apply returning (cls_probs, box_deltas)
plus two pure functions — ``detection_loss`` and ``postprocess_detections`` —
that jit/vmap/shard cleanly and support any batch size.

Anchors are baked in as compile-time constants (ops/anchors.py) instead of the
reference's per-step host numpy regeneration (models/module.py:161-180).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import DetectorConfig
from ..ops import anchors as anchor_ops
from ..ops import boxes as box_ops
from ..ops import losses as loss_ops
from ..ops import nms as nms_ops
from .bifpn import BiFPN
from .efficientnet import EfficientNetFeatures, backbone_feature_channels
from .retina_head import RetinaHead

Dtype = Any


class EfficientDet(nn.Module):
    """The detector network. __call__(images NHWC) -> (cls_probs, box_deltas).

    cls_probs: (B, A_total, num_classes) post-sigmoid, float32
    box_deltas: (B, A_total, 4) float32
    """

    config: DetectorConfig
    dtype: Dtype = jnp.float32
    remat: bool = False
    use_pallas_fusion: bool = False

    def setup(self):
        cfg = self.config.resolve()
        self._cfg = cfg
        self.backbone = EfficientNetFeatures(
            model_name=cfg.backbone_name, bn_mode=cfg.bn_mode,
            bn_axis_name="data" if cfg.bn_mode == "sync" else None,
            dtype=self.dtype, remat=self.remat, name="backbone")
        in_channels = backbone_feature_channels(cfg.backbone_name)[-5:]
        self.neck = BiFPN(in_channels=in_channels, out_channels=cfg.W_bifpn,
                          stack=cfg.D_bifpn, dtype=self.dtype,
                          use_pallas=self.use_pallas_fusion, name="neck")
        self.head = RetinaHead(
            num_classes=cfg.num_classes, in_channels=cfg.W_bifpn,
            feat_channels=cfg.head_feat_channels,
            stacked_convs=cfg.head_stacked_convs,
            num_anchors=cfg.num_anchors_per_cell,
            dtype=self.dtype, name="head")

    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        features = self.backbone(images.astype(self.dtype), train)
        pyramid = self.neck(features[-5:])
        cls_probs, box_deltas = self.head(pyramid)
        return cls_probs.astype(jnp.float32), box_deltas.astype(jnp.float32)

    def train_forward(self, images: jnp.ndarray, train: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training hot-path forward: (cls_logits, box_deltas) in the compute
        dtype (bf16 under --bf16), pre-sigmoid, NOT cast to f32.

        Pairs with ``detection_loss_from_logits``: the loss upcasts inside
        its fused elementwise kernel, so the (B, A, C) tensor crosses HBM
        once in bf16 and the f32 sigmoid tensor of the reference's training
        path (models/efficientdet.py:57-68) never exists.
        """
        features = self.backbone(images.astype(self.dtype), train)
        pyramid = self.neck(features[-5:])
        return self.head(pyramid, return_logits=True)

    def train_forward_levels(self, images: jnp.ndarray, train: bool = True):
        """Per-level training forward: (cls_logits_levels, box_delta_levels)
        — lists of (B, A_l, num_classes)/(B, A_l, 4) in the compute dtype,
        one entry per pyramid level, NOT concatenated.

        Pairs with ``detection_loss_from_level_logits``: identical numbers
        to ``train_forward`` + ``detection_loss_from_logits``, but the
        (B, A_total, C) concatenation — whose tiled-layout relayout copies
        and dynamic-update-slices cost ~10 ms of the 168 ms D0@512 b64 step
        on v5e — never materializes (docs/DESIGN.md train-profile table).
        """
        features = self.backbone(images.astype(self.dtype), train)
        pyramid = self.neck(features[-5:])
        return self.head(pyramid, return_logits=True, per_level=True)

    def extract_features(self, images: jnp.ndarray,
                         train: bool = False) -> List[jnp.ndarray]:
        """Backbone+neck pyramid (reference extract_feat, efficientdet.py:94-100)."""
        features = self.backbone(images.astype(self.dtype), train)
        return self.neck(features[-5:])

    def serving_forward(self, images: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Bandwidth-optimal inference forward:
        (scores (B, A) f32, classes (B, A) i32, box_deltas (B, A, 4) f32).

        Identical selection to __call__ + class max/argmax (sigmoid is
        monotonic), but the per-anchor class reduction happens per level
        inside the head, so the (B, A, C) probability tensor is never
        materialized in HBM. Feed the result to
        ``postprocess_from_scores`` / ``ops.nms.batched_nms_from_scores``.
        """
        features = self.backbone(images.astype(self.dtype), False)
        pyramid = self.neck(features[-5:])
        return self.head(pyramid, reduce_classes=True)

    def serving_from_features(self, features: Sequence[jnp.ndarray]
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """`serving_forward` continuation from precomputed backbone features
        — entry point for the fused-Pallas backbone
        (models/fused_serving.py), which computes the pyramid outside flax
        from the same variables tree."""
        pyramid = self.neck([f.astype(self.dtype) for f in features[-5:]])
        return self.head(pyramid, reduce_classes=True)


def anchors_for_config(cfg: DetectorConfig) -> jnp.ndarray:
    """(A_total, 4) anchor constant for the configured input size.

    Assumes the ceil feature pyramid (H_l = ceil(input/2^l)) — exact at
    every production geometry (input divisible by 128). For off-spec input
    sizes use ``anchors_for_model``, which reads the model's actual
    feature shapes."""
    cfg = cfg.resolve()
    return jnp.asarray(anchor_ops.anchors_for_image_size(
        cfg.input_size, tuple(cfg.pyramid_levels), tuple(cfg.anchor_ratios),
        tuple(cfg.anchor_scales)))


def pyramid_shapes_for_model(model: "EfficientDet",
                             cfg: DetectorConfig) -> Tuple[Tuple[int, int], ...]:
    """The model's ACTUAL per-level (H, W) pyramid shapes, via abstract
    tracing (``jax.eval_shape`` — no FLOPs, no device).

    At input sizes divisible by 128 this equals the ceil pyramid; at other
    sizes the backbone's nominal-size static-SAME padding (the reference's
    Conv2dStaticSamePadding quirk, models/utils.py:126-149) yields smaller
    grids, and anchors/loss/postprocess must follow the head's real shapes
    rather than the ceil assumption (the reference crashes outright there —
    see docs/DESIGN.md on D7@1636)."""
    import jax

    cfg = cfg.resolve()
    x = jax.ShapeDtypeStruct((1, cfg.input_size, cfg.input_size, 3),
                             jnp.float32)
    variables = jax.eval_shape(
        lambda im: model.init(jax.random.PRNGKey(0), im), x)
    feats = jax.eval_shape(
        lambda v, im: model.apply(v, im,
                                  method=EfficientDet.extract_features),
        variables, x)
    return tuple((f.shape[1], f.shape[2]) for f in feats)


def anchors_for_model(model: "EfficientDet", cfg: DetectorConfig
                      ) -> jnp.ndarray:
    """(A_total, 4) anchors matching the model's actual head grids — the
    robust variant of ``anchors_for_config`` (identical at production
    geometries, correct at any input size)."""
    cfg = cfg.resolve()
    shapes = pyramid_shapes_for_model(model, cfg)
    return jnp.asarray(anchor_ops.anchors_for_feature_shapes(
        shapes, tuple(cfg.pyramid_levels), tuple(cfg.anchor_ratios),
        tuple(cfg.anchor_scales)))


def anchor_levels_for_model(model: "EfficientDet", cfg: DetectorConfig
                            ) -> List[jnp.ndarray]:
    """Per-level anchor constants [(A_l, 4), ...] matching the model's
    actual head grids — ``anchors_for_model`` split at the level
    boundaries, for the per-level training path."""
    cfg = cfg.resolve()
    shapes = pyramid_shapes_for_model(model, cfg)
    anchors = anchors_for_model(model, cfg)
    per_cell = cfg.num_anchors_per_cell
    out, start = [], 0
    for (h, w) in shapes:
        n = h * w * per_cell
        out.append(anchors[start:start + n])
        start += n
    assert start == anchors.shape[0]
    return out


def detection_loss(cls_probs: jnp.ndarray, box_deltas: jnp.ndarray,
                   anchors: jnp.ndarray, annotations: jnp.ndarray,
                   cfg: DetectorConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cls_loss, reg_loss) — the training objective (reference losses.py)."""
    return loss_ops.focal_loss(cls_probs, box_deltas, anchors, annotations,
                               alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)


def detection_loss_from_logits(cls_logits: jnp.ndarray,
                               box_deltas: jnp.ndarray,
                               anchors: jnp.ndarray, annotations: jnp.ndarray,
                               cfg: DetectorConfig
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cls_loss, reg_loss) from ``train_forward`` outputs — the stable,
    bandwidth-minimal training objective (see ops/losses.py
    focal_loss_from_logits)."""
    return loss_ops.focal_loss_from_logits(
        cls_logits, box_deltas, anchors, annotations,
        alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)


def detection_loss_from_level_logits(cls_levels, reg_levels, anchor_levels,
                                     annotations: jnp.ndarray,
                                     cfg: DetectorConfig
                                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cls_loss, reg_loss) from ``train_forward_levels`` outputs — the
    bandwidth-minimal training objective: same numbers as
    ``detection_loss_from_logits`` without the (B, A_total, C) concat
    (see ops/losses.py focal_loss_from_level_logits)."""
    return loss_ops.focal_loss_from_level_logits(
        cls_levels, reg_levels, anchor_levels, annotations,
        alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)


def postprocess_detections(cls_probs: jnp.ndarray, box_deltas: jnp.ndarray,
                           anchors: jnp.ndarray, cfg: DetectorConfig,
                           score_threshold: Optional[float] = None,
                           iou_threshold: Optional[float] = None
                           ) -> nms_ops.Detections:
    """Candidate top-k -> decode -> clip -> fixed-shape greedy NMS
    (reference efficientdet.py:70-86, restructured for TPU bandwidth — see
    ops/nms.py batched_nms_from_deltas)."""
    cfg = cfg.resolve()
    return nms_ops.batched_nms_from_deltas(
        cls_probs, box_deltas, anchors, cfg.input_size, cfg.input_size,
        score_threshold=(cfg.threshold if score_threshold is None
                         else score_threshold),
        iou_threshold=(cfg.iou_threshold if iou_threshold is None
                       else iou_threshold),
        pre_nms_top_k=cfg.pre_nms_top_k,
        max_detections=cfg.max_detections,
        approx_topk=cfg.approx_topk)


def postprocess_from_scores(scores: jnp.ndarray, classes: jnp.ndarray,
                            box_deltas: jnp.ndarray, anchors: jnp.ndarray,
                            cfg: DetectorConfig,
                            score_threshold: Optional[float] = None,
                            iou_threshold: Optional[float] = None
                            ) -> nms_ops.Detections:
    """NMS tail for ``EfficientDet.serving_forward`` outputs — same results
    as ``postprocess_detections`` without re-reading a (B, A, C) tensor."""
    cfg = cfg.resolve()
    return nms_ops.batched_nms_from_scores(
        scores, classes, box_deltas, anchors, cfg.input_size, cfg.input_size,
        score_threshold=(cfg.threshold if score_threshold is None
                         else score_threshold),
        iou_threshold=(cfg.iou_threshold if iou_threshold is None
                       else iou_threshold),
        pre_nms_top_k=cfg.pre_nms_top_k,
        max_detections=cfg.max_detections,
        approx_topk=cfg.approx_topk)
