#!/usr/bin/env python
"""Metric-level parity: reference evaluator vs this framework, same weights.

BASELINE.md's accuracy criterion is "VOC mAP within 0.2 of the reference".
With zero egress the published VOC2007 run can't be reproduced, but the
criterion's substance — model + NMS + evaluator agree at the METRIC level —
is locally testable: export one checkpoint trained in this framework into
the reference's own torch ``EfficientDet`` (utils/torch_export.py), run the
reference's own ``evaluate()`` loop (reference eval.py:165-257, batch-1,
torch NMS, numpy AP) and this repo's ``eval.py`` over the SAME images, and
compare mAPs.

The reference code runs UNMODIFIED from /root/reference via importlib; the
only shims are environmental (this box has no GPU / torchvision /
albumentations / pycocotools):
  - ``torchvision.ops.nms`` -> a faithful greedy NMS in plain torch
    (sort by score desc, suppress IoU > threshold; identical contract to
    torchvision's documented semantics, which reference efficientdet.py:82
    relies on)
  - ``.cuda()`` -> identity (CPU execution)
  - ``EfficientNet.from_pretrained`` -> ``from_name`` (no blob download;
    weights are overwritten by the exported checkpoint anyway)
  - module stubs for albumentations / pycocotools / torchvision.transforms
    (only ``transforms.Compose`` is actually exercised)

Usage:
    python tools/parity_eval.py --weight CKPT_DIR \
        --dataset_root /root/repo/.data/minivoc [--threshold 0.05]

Prints one JSON line {"ref_mAP", "ours_mAP", "delta", ...} and a per-class
table on stderr.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


# ---------------------------------------------------------------- shims ---

def _faithful_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms contract: keep indices, score-descending; a box is
    suppressed when IoU with an already-kept box exceeds iou_threshold."""
    import torch
    order = torch.argsort(scores, descending=True)
    b = boxes[order]
    x1, y1, x2, y2 = b.unbind(dim=1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    keep = []
    alive = torch.ones(b.shape[0], dtype=torch.bool)
    for i in range(b.shape[0]):
        if not alive[i]:
            continue
        keep.append(order[i].item())
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter).clamp(min=1e-12)
        alive &= iou <= iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def _install_stubs():
    import torch

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = _faithful_nms
    tv_tf = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, sample):
            for fn in self.fns:
                sample = fn(sample)
            return sample

    tv_tf.Compose = Compose
    tv.ops, tv.transforms = tv_ops, tv_tf
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv_ops)
    sys.modules.setdefault("torchvision.transforms", tv_tf)

    albu = types.ModuleType("albumentations")
    albu_pt = types.ModuleType("albumentations.pytorch")
    albu_pt_tf = types.ModuleType("albumentations.pytorch.transforms")
    albu_pt_tf.ToTensor = object
    albu.pytorch = albu_pt
    albu_pt.transforms = albu_pt_tf
    sys.modules.setdefault("albumentations", albu)
    sys.modules.setdefault("albumentations.pytorch", albu_pt)
    sys.modules.setdefault("albumentations.pytorch.transforms", albu_pt_tf)

    coco = types.ModuleType("pycocotools")
    cocoeval = types.ModuleType("pycocotools.cocoeval")
    cocoeval.COCOeval = object
    coco.cocoeval = cocoeval
    sys.modules.setdefault("pycocotools", coco)
    sys.modules.setdefault("pycocotools.cocoeval", cocoeval)

    # CPU box: .cuda() -> identity
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def _load(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Import the reference's eval.py (and its model/data deps) unmodified."""
    _install_stubs()

    if "models" not in sys.modules or not hasattr(
            sys.modules.get("models"), "__path__"):
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{REF}/models"]
        sys.modules["models"] = pkg
    _load("models.utils", f"{REF}/models/utils.py")
    _load("models.module", f"{REF}/models/module.py")
    effnet = _load("models.efficientnet", f"{REF}/models/efficientnet.py")
    _load("models.bifpn", f"{REF}/models/bifpn.py")
    _load("models.retinahead", f"{REF}/models/retinahead.py")
    _load("models.losses", f"{REF}/models/losses.py")
    # no egress: from_pretrained would download; weights are replaced by the
    # exported checkpoint immediately after construction regardless
    effnet.EfficientNet.from_pretrained = classmethod(
        lambda cls, name, *a, **k: cls.from_name(name))
    refdet = _load("models.efficientdet", f"{REF}/models/efficientdet.py")

    voc = _load("ref_voc0712", f"{REF}/datasets/voc0712.py")
    aug = _load("ref_augmentation", f"{REF}/datasets/augmentation.py")
    ds = types.ModuleType("datasets")
    for n in ("VOCDetection", "VOCAnnotationTransform", "VOC_CLASSES"):
        setattr(ds, n, getattr(voc, n))
    for n in ("Normalizer", "Resizer", "Augmenter", "collater",
              "detection_collate", "get_augumentation"):
        setattr(ds, n, getattr(aug, n))
    ds.CocoDataset = object  # pycocotools-backed; not under test
    sys.modules["datasets"] = ds

    cfg_eff = _load("ref_config_eff", f"{REF}/utils/config_eff.py")
    helper = _load("ref_helper", f"{REF}/utils/helper.py")
    ut = types.ModuleType("utils")
    ut.EFFICIENTDET = cfg_eff.EFFICIENTDET
    ut.get_state_dict = helper.get_state_dict
    sys.modules["utils"] = ut

    ref_eval = _load("ref_eval", f"{REF}/eval.py")
    return ref_eval, refdet, ds


# ------------------------------------------------------------ experiment ---

def run_reference_eval(weight_dir: str, dataset_root: str, threshold: float,
                       iou_threshold: float, max_detections: int):
    """Reference evaluate() on the exported checkpoint. Returns (mAP, per-class)."""
    import torch

    ref_eval, refdet, ds = load_reference()

    from efficientdet_tpu.utils import checkpoint as ckpt
    from efficientdet_tpu.utils.torch_export import export_efficientdet

    cfg = ckpt.load_config(weight_dir)
    if cfg is None:
        raise SystemExit(f"no config found in checkpoint dir {weight_dir}")
    cfg = cfg.resolve()

    torch.manual_seed(0)
    model = refdet.EfficientDet(
        num_classes=cfg.num_classes, network=cfg.network,
        W_bifpn=cfg.W_bifpn, D_bifpn=cfg.D_bifpn, D_class=cfg.D_class,
        is_training=False, threshold=threshold, iou_threshold=iou_threshold)
    model.eval()

    # load our checkpoint -> flax tree -> reference state_dict (strict)
    import jax.numpy as jnp

    from efficientdet_tpu.models import EfficientDet as JaxDet
    jmodel = JaxDet(config=cfg)
    import jax
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    variables = ckpt.load_weights(weight_dir, dict(variables))
    state = export_efficientdet(variables, model.state_dict())
    model.load_state_dict(state, strict=True)

    dataset = ds.VOCDetection(
        root=dataset_root, image_sets=[("2007", "test")],
        transform=sys.modules["torchvision.transforms"].Compose(
            [ds.Normalizer(), ds.Resizer()]))
    mean_ap, per_class = ref_eval.evaluate(
        dataset, model, iou_threshold=0.5, score_threshold=threshold,
        max_detections=max_detections)
    names = {i: dataset.label_to_name(i) for i in per_class}
    return float(mean_ap), {names[i]: (float(ap), int(n))
                            for i, (ap, n) in per_class.items()}


def run_our_eval(weight_dir: str, dataset_root: str, threshold: float,
                 iou_threshold: float, max_detections: int,
                 platform: str = "cpu"):
    import jax
    if platform != "default":
        jax.config.update("jax_platforms", platform)
    # reference side runs torch in f32; force full-f32 conv accumulation so
    # the comparison isolates implementation differences, not dtype policy
    jax.config.update("jax_default_matmul_precision", "highest")
    import dataclasses

    import jax.numpy as jnp

    from efficientdet_tpu.data import VOCDetection, eval_transforms
    from efficientdet_tpu.eval import evaluate_model
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import make_eval_step
    from efficientdet_tpu.utils import checkpoint as ckpt

    cfg = ckpt.load_config(weight_dir).resolve()
    cfg = dataclasses.replace(cfg, threshold=threshold,
                              iou_threshold=iou_threshold,
                              max_detections=max_detections)
    dataset = VOCDetection(dataset_root, image_sets=[("2007", "test")],
                           transform=eval_transforms(cfg.input_size))
    model = EfficientDet(config=cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    variables = ckpt.load_weights(weight_dir, dict(variables))
    eval_step = jax.jit(make_eval_step(model, cfg))
    mean_ap, per_class = evaluate_model(
        dataset, lambda im: eval_step(variables, jnp.asarray(im)),
        dataset.num_classes(), batch_size=4, iou_threshold=0.5,
        score_threshold=threshold, max_detections=max_detections,
        input_size=cfg.input_size, native="off")
    return float(mean_ap), per_class


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weight", required=True, help="native checkpoint dir")
    p.add_argument("--dataset_root", default="/root/repo/.data/minivoc")
    p.add_argument("--threshold", type=float, default=0.05)
    p.add_argument("--iou_threshold", type=float, default=0.5)
    p.add_argument("--max_detections", type=int, default=100)
    p.add_argument("--platform", default="default",
                   help="jax platform for OUR eval side ('default' keeps the "
                        "real TPU; reference side is torch CPU regardless)")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp")

    ours, _ = run_our_eval(args.weight, args.dataset_root, args.threshold,
                           args.iou_threshold, args.max_detections,
                           platform=args.platform)
    ref, per_class = run_reference_eval(
        args.weight, args.dataset_root, args.threshold, args.iou_threshold,
        args.max_detections)
    print(f"per-class reference AP: {per_class}", file=sys.stderr)
    print(json.dumps({
        "ref_mAP": round(ref, 4), "ours_mAP": round(ours, 4),
        "delta": round(abs(ref - ours), 4),
        "threshold": args.threshold, "iou_threshold": args.iou_threshold,
        "dataset_root": args.dataset_root, "weight": args.weight,
        "within_0.2": abs(ref - ours) <= 0.2}))


if __name__ == "__main__":
    main()
