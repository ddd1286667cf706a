#!/usr/bin/env python
"""Visualize augmented training samples with their boxes.

Equivalent of reference datasets/visual_aug.py: renders N augmented samples
(VOC or synthetic) with GT boxes drawn, into an output directory.

    python tools/visualize_augmentation.py --dataset synthetic --num 5
    python tools/visualize_augmentation.py --dataset VOC \
        --dataset_root ~/data/VOCdevkit --num 5 --out /tmp/aug_vis
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic",
                   choices=["VOC", "synthetic"])
    p.add_argument("--dataset_root", default="/root/data/VOCdevkit/")
    p.add_argument("--num", type=int, default=5)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", default="/tmp/aug_vis")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--augment", default="basic", choices=["basic", "full"],
                   help="full = the reference albumentations recipe "
                        "(crop/flip/transpose/photometric/CLAHE)")
    args = p.parse_args()

    import cv2
    from efficientdet_tpu.data import (SyntheticDetection, VOCDetection,
                                       get_augmentation, train_transforms)
    from efficientdet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    if args.augment == "full":
        tf = get_augmentation("train", width=args.size, height=args.size,
                              seed=args.seed)
    else:
        tf = train_transforms(args.size, photometric=True, seed=args.seed)
    if args.dataset == "VOC":
        ds = VOCDetection(args.dataset_root,
                          image_sets=[("2007", "trainval")], transform=tf)
        names = ds.label_to_name
    else:
        ds = SyntheticDetection(length=args.num, image_size=args.size,
                                num_classes=20, transform=tf, seed=args.seed)
        names = ds.label_to_name

    os.makedirs(args.out, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        s = ds[i]
        # un-normalize for display
        img = (s["img"] * IMAGENET_STD + IMAGENET_MEAN)
        img = np.clip(img * 255, 0, 255).astype(np.uint8)[:, :, ::-1].copy()
        for box in s["annot"]:
            x1, y1, x2, y2, label = box
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
            cv2.putText(img, names(int(label)), (int(x1), max(int(y1) - 5, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 2)
        path = os.path.join(args.out, f"aug_{i}.png")
        cv2.imwrite(path, img)
        print(f"wrote {path} ({len(s['annot'])} boxes)")


if __name__ == "__main__":
    main()
