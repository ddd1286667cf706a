#!/usr/bin/env python
"""Evaluation driver — TPU-native replacement for reference eval.py.

    python eval.py --dataset VOC --dataset_root ~/data/VOCdevkit --weight DIR
    python eval.py --dataset COCO --dataset_root ~/data/coco --weight ckpt.pth
    python eval.py --dataset synthetic --weight DIR     # offline smoke eval

`--weight` accepts a native checkpoint directory or a reference `.pth` blob.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def parse_args():
    p = argparse.ArgumentParser(description="EfficientDet-TPU evaluation")
    p.add_argument("--dataset", default="VOC",
                   choices=["VOC", "COCO", "synthetic"])
    p.add_argument("--dataset_root", default="/root/data/VOCdevkit/")
    p.add_argument("--weight", required=True)
    p.add_argument("--network", default="efficientdet-d0")
    p.add_argument("--num_class", type=int, default=None)
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--threshold", type=float, default=0.05,
                   help="score threshold (reference eval uses 0.05)")
    p.add_argument("--iou_threshold", type=float, default=0.5,
                   help="NMS IoU threshold")
    p.add_argument("--eval_iou", type=float, default=0.5,
                   help="VOC matching IoU")
    p.add_argument("--max_detections", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fused_backbone", action="store_true",
                   help="serve the backbone through the fused-Pallas MBConv "
                        "kernels (models/fused_serving.py; TPU, frozen BN)")
    p.add_argument("--results_json", default=None,
                   help="COCO: write results JSON here")
    p.add_argument("--synthetic_length", type=int, default=16)
    p.add_argument("--native_loader", default="auto",
                   choices=["auto", "on", "off"],
                   help="C++ decode pipeline for eval batches")
    p.add_argument("--platform", default="auto",
                   help="jax platform pin (e.g. 'cpu'); flag, not env — a "
                        "site hook may pre-import jax before JAX_PLATFORMS")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from efficientdet_tpu.utils import jax_setup
    jax_setup.enable_compilation_cache()
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from efficientdet_tpu import EFFICIENTDET, DetectorConfig
    from efficientdet_tpu.data import (CocoDataset, SyntheticDetection,
                                       VOCDetection, eval_transforms)
    from efficientdet_tpu.eval import (CocoEvaluator, evaluate_model,
                                       write_coco_results)
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import make_eval_step
    from efficientdet_tpu.utils import checkpoint as ckpt

    # the checkpoint's config defines the model geometry; read it FIRST so
    # the dataset resizes to the size the model was built for. Works for
    # native dirs AND reference .pth blobs (parser-blob recovery, reference
    # eval.py:365-374) — no --network/--num_class flags needed either way.
    saved_cfg = ckpt.load_config(args.weight)
    input_size = (args.input_size
                  or (saved_cfg.input_size if saved_cfg else None)
                  or EFFICIENTDET[args.network]["input_size"])
    tf = eval_transforms(input_size)
    if args.dataset == "VOC":
        dataset = VOCDetection(args.dataset_root,
                               image_sets=[("2007", "test")], transform=tf)
    elif args.dataset == "COCO":
        dataset = CocoDataset(args.dataset_root, set_name="val2017",
                              transform=tf)
    else:
        n_cls = (args.num_class
                 or (saved_cfg.num_classes if saved_cfg else 20))
        dataset = SyntheticDetection(length=args.synthetic_length,
                                     image_size=input_size,
                                     num_classes=n_cls, transform=tf)
    num_classes = args.num_class or dataset.num_classes()

    cfg = saved_cfg or DetectorConfig(num_classes=num_classes,
                                      network=args.network,
                                      input_size=input_size)
    if saved_cfg is not None:
        num_classes = saved_cfg.num_classes  # model defines the class space
    cfg = cfg.resolve()
    import dataclasses
    cfg = dataclasses.replace(cfg, input_size=input_size,
                              threshold=args.threshold,
                              iou_threshold=args.iou_threshold,
                              max_detections=args.max_detections)

    model = EfficientDet(config=cfg,
                         dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    variables = ckpt.load_weights(args.weight, dict(variables))
    eval_step = jax.jit(make_eval_step(
        model, cfg, fused_backbone=args.fused_backbone))
    eval_fn = lambda images: eval_step(variables, jnp.asarray(images))

    if args.dataset in ("VOC", "synthetic"):
        mean_ap, _ = evaluate_model(
            dataset, eval_fn, num_classes, batch_size=args.batch_size,
            iou_threshold=args.eval_iou, score_threshold=args.threshold,
            max_detections=args.max_detections, input_size=input_size,
            native=args.native_loader)
        print(f"mAP@{args.eval_iou}: {mean_ap:.4f}")
        return

    # COCO path: accumulate + COCO metrics; optionally write results JSON
    from efficientdet_tpu.data.loader import eval_batches, prefetch_iter
    evaluator = CocoEvaluator(num_classes, max_dets=args.max_detections)
    image_ids, dets_for_json = [], []
    n = len(dataset)
    bs = args.batch_size
    batches = prefetch_iter(
        eval_batches(dataset, bs, input_size, args.native_loader))
    for idx, images, scales in batches:
        det = eval_fn(images)
        for j, i in enumerate(idx):
            valid = np.asarray(det.valid[j])
            boxes = np.asarray(det.boxes[j])[valid] / float(scales[j])
            scores = np.asarray(det.scores[j])[valid]
            classes = np.asarray(det.classes[j])[valid]
            gts = dataset.load_annotations(i)
            evaluator.add_image(
                np.concatenate([boxes, scores[:, None]], axis=1), classes,
                gts[:, :4], gts[:, 4].astype(int))
            if args.results_json:
                image_ids.append(dataset.image_ids[i])
                dets_for_json.append({"boxes": boxes, "scores": scores,
                                      "classes": classes})
        print(f"{idx[-1] + 1}/{n}", end="\r")
    print()
    stats = evaluator.summarize()
    if args.results_json:
        write_coco_results(args.results_json, image_ids, dets_for_json,
                           dataset.label_to_coco_label)
        print(f"wrote {args.results_json}")
        try:
            from pycocotools.coco import COCO  # optional official bridge
            from efficientdet_tpu.eval import evaluate_coco_with_pycocotools
            ann = os.path.join(args.dataset_root, "annotations",
                               "instances_val2017.json")
            evaluate_coco_with_pycocotools(COCO(ann), args.results_json,
                                           image_ids)
        except ImportError:
            pass
    print({k: round(v, 4) for k, v in stats.items()})


if __name__ == "__main__":
    main()
