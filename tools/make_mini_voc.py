#!/usr/bin/env python
"""Build a real-image mini dataset in VOCdevkit layout (no-egress stand-in).

This environment has no network egress and no VOC/COCO on disk, so the
reference's headline VOC2007 evaluation (reference README.md:45-49) cannot be
reproduced verbatim. This tool builds the closest attainable stand-in: a
detection dataset made of REAL photographic pixels with exact ground truth,
written in the exact VOCdevkit on-disk format so the entire production path
is exercised unmodified — VOCDetection XML parsing (data/voc.py), the native
C++ JPEG decode (native/edt_native.cpp), train.py's VOC branch, eval.py's
VOC protocol (eval/voc_eval.py).

Construction: object prototypes are cropped from the real photographs under
/root/reference/docs (a 2000x1500 street scene), then composited at random
scales/positions onto random background crops of the same photographs.
Ground-truth boxes are the pasted extents, written as 1-based VOC XML
coordinates (parse_voc_xml subtracts 1, recovering exact pixel boxes).
Labels reuse VOC class names so num_classes/evaluators work unchanged.

Covering all 20 VOC classes (--classes 20, the default): 5 hand-picked
prototypes (below) plus auto-selected crops — the highest-local-variance
non-overlapping windows of the source photos, with per-class aspect ratios.
Because all crops come from the same two photographs, each class beyond the
hand-picked 5 additionally carries a fixed per-class RGB gain triple
(deterministic, mild, in [0.75, 1.25]) so the 20 appearance classes are
mutually separable — pixels stay photographic texture; the per-class tint
is the only synthetic signal and is documented in ACCURACY.md.

Usage:
    python tools/make_mini_voc.py --out /root/data/minivoc \
        --train 1500 --test 300 [--size 512] [--seed 0] [--classes 20]
Then:
    python train.py --dataset VOC --dataset_root /root/data/minivoc ...
    python eval.py  --dataset VOC --dataset_root /root/data/minivoc ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np

SOURCES = ["/root/reference/docs/demo.png", "/root/reference/docs/output.png"]
# (class name, source index, x, y, w, h) — distinct high-texture regions of
# the 2000x1500 street scene; names are VOC classes so evaluators need no
# remapping (the semantic match is irrelevant for an end-to-end proof).
PROTOTYPES = [
    ("person", 0, 760, 420, 220, 420),
    ("car", 0, 1000, 640, 400, 260),
    ("bicycle", 0, 170, 760, 330, 300),
    ("dog", 0, 1100, 1500, 300, 260),
    ("chair", 0, 420, 120, 360, 260),
]

# all 20 VOC class names, in the canonical order (data/voc.py:16-19)
VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


def _auto_crops(sources, count: int, taken, rng: np.random.RandomState):
    """Pick `count` non-overlapping high-texture windows from the sources.

    Deterministic given the rng: per crop, a random aspect/size window is
    slid over a coarse grid of a random source; the position with the
    highest local pixel variance that does not overlap previously taken
    windows (same source) wins. High variance = distinctive texture, which
    is what makes a class learnable against the background.
    """
    crops = []
    for k in range(count):
        best = None
        si = rng.randint(len(sources))
        src = sources[si]
        sh, sw = src.shape[:2]
        aspect = [0.5, 0.75, 1.0, 1.4, 2.0][k % 5]
        base = min(sh, sw) // 5
        w = int(min(base * aspect, sw // 3))
        h = int(min(base / aspect, sh // 3))
        w, h = max(w, 48), max(h, 48)
        gray = src.astype(np.float32).mean(axis=2)
        step_y, step_x = max((sh - h) // 12, 1), max((sw - w) // 12, 1)
        for y in range(0, sh - h, step_y):
            for x in range(0, sw - w, step_x):
                if any(ti == si and x < tx + tw and tx < x + w
                       and y < ty + th and ty < y + h
                       for ti, tx, ty, tw, th in taken):
                    continue
                v = float(gray[y:y + h, x:x + w].var())
                if best is None or v > best[0]:
                    best = (v, x, y)
        if best is None:            # source exhausted: allow overlap
            x = rng.randint(0, sw - w)
            y = rng.randint(0, sh - h)
            best = (0.0, x, y)
        _, x, y = best
        taken.append((si, x, y, w, h))
        crops.append(src[y:y + h, x:x + w].copy())
    return crops


def build_prototypes(sources, num_classes: int,
                     rng: np.random.RandomState):
    """(class_name, patch_bgr_uint8) for the first `num_classes` VOC classes.

    The 5 hand-picked PROTOTYPES keep their historical crops (so 5-class
    datasets reproduce across rounds); remaining classes get auto-selected
    crops plus a fixed per-class RGB gain in [0.75, 1.25] for separability.
    """
    manual = {}
    taken = []
    for cls, si, x, y, w, h in PROTOTYPES:
        src = sources[min(si, len(sources) - 1)]
        patch = src[y:y + h, x:x + w].copy()
        assert patch.size, f"prototype {cls} out of bounds for {src.shape}"
        manual[cls] = patch
        taken.append((min(si, len(sources) - 1), x, y, w, h))

    classes = [c for c in VOC_CLASSES][:num_classes]
    need = [c for c in classes if c not in manual]
    auto = _auto_crops(sources, len(need), taken, rng)
    gain_rng = np.random.RandomState(20)   # fixed: gains are part of the
    #   dataset definition, not of the sampling seed
    gains = {c: gain_rng.uniform(0.75, 1.25, size=3) for c in VOC_CLASSES}
    protos = []
    for c in classes:
        if c in manual:
            protos.append((c, manual[c]))
        else:
            p = auto[need.index(c)].astype(np.float32) * gains[c]
            protos.append((c, np.clip(p, 0, 255).astype(np.uint8)))
    return protos


def _load_sources():
    import cv2
    imgs = []
    for p in SOURCES:
        img = cv2.imread(p)
        if img is not None:
            imgs.append(img)
    if not imgs:
        raise FileNotFoundError(f"no source photos found in {SOURCES}")
    return imgs


def _xml(img_id: str, size: int, boxes) -> str:
    objs = []
    for x1, y1, x2, y2, name in boxes:
        objs.append(f"""  <object>
    <name>{name}</name>
    <difficult>0</difficult>
    <bndbox>
      <xmin>{int(x1) + 1}</xmin>
      <ymin>{int(y1) + 1}</ymin>
      <xmax>{int(x2) + 1}</xmax>
      <ymax>{int(y2) + 1}</ymax>
    </bndbox>
  </object>""")
    objects = "\n".join(objs)
    return f"""<annotation>
  <folder>VOC2007</folder>
  <filename>{img_id}.jpg</filename>
  <size>
    <width>{size}</width>
    <height>{size}</height>
    <depth>3</depth>
  </size>
{objects}
</annotation>
"""


def make_split(base: str, name: str, count: int, size: int,
               rng: np.random.RandomState, num_classes: int = 5,
               max_objects: int = 4) -> None:
    import cv2
    sources = _load_sources()
    # prototype selection is seeded independently of the sampling rng so
    # train/test splits (different rngs) get IDENTICAL class appearances
    protos = build_prototypes(sources, num_classes,
                              np.random.RandomState(7))

    ids = []
    for n in range(count):
        img_id = f"{name}{n:04d}"
        ids.append(img_id)
        # random background crop from a random photo (real pixels)
        src = sources[rng.randint(len(sources))]
        sh, sw = src.shape[:2]
        cmax = min(sh, sw)
        c = rng.randint(size, cmax + 1) if cmax > size else cmax
        y0 = rng.randint(0, sh - c + 1)
        x0 = rng.randint(0, sw - c + 1)
        bg = cv2.resize(src[y0:y0 + c, x0:x0 + c], (size, size),
                        interpolation=cv2.INTER_LINEAR)
        if rng.rand() < 0.5:
            bg = bg[:, ::-1].copy()

        boxes = []
        for _ in range(rng.randint(1, max_objects + 1)):
            cls, patch = protos[rng.randint(len(protos))]
            ph, pw = patch.shape[:2]
            s = rng.uniform(0.45, 1.1) * size / max(ph, pw) * 0.45
            nw, nh = max(int(pw * s), 16), max(int(ph * s), 16)
            p = cv2.resize(patch, (nw, nh), interpolation=cv2.INTER_LINEAR)
            if rng.rand() < 0.5:
                p = p[:, ::-1].copy()
            # mild photometric jitter keeps prototypes non-identical
            p = np.clip(p.astype(np.float32) * rng.uniform(0.8, 1.2)
                        + rng.uniform(-16, 16), 0, 255).astype(np.uint8)
            px = rng.randint(0, size - nw)
            py = rng.randint(0, size - nh)
            bg[py:py + nh, px:px + nw] = p
            boxes.append((px, py, px + nw - 1, py + nh - 1, cls))

        cv2.imwrite(os.path.join(base, "JPEGImages", f"{img_id}.jpg"), bg,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        with open(os.path.join(base, "Annotations", f"{img_id}.xml"),
                  "w") as f:
            f.write(_xml(img_id, size, boxes))

    with open(os.path.join(base, "ImageSets", "Main", f"{name}.txt"),
              "w") as f:
        f.write("\n".join(ids) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/data/minivoc")
    ap.add_argument("--train", type=int, default=200)
    ap.add_argument("--test", type=int, default=50)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--classes", type=int, default=20,
                    help="number of VOC classes to cover (canonical order); "
                         "5 reproduces the round-1..3 hand-picked dataset")
    ap.add_argument("--max_objects", type=int, default=4)
    args = ap.parse_args()

    base = os.path.join(args.out, "VOC2007")
    for sub in ("JPEGImages", "Annotations",
                os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    make_split(base, "trainval", args.train, args.size,
               np.random.RandomState(args.seed),
               num_classes=args.classes, max_objects=args.max_objects)
    make_split(base, "test", args.test, args.size,
               np.random.RandomState(args.seed + 1),
               num_classes=args.classes, max_objects=args.max_objects)
    print(f"mini-VOC written to {args.out}: {args.train} trainval + "
          f"{args.test} test @ {args.size}px, {args.classes} classes")


if __name__ == "__main__":
    main()
