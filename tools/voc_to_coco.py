#!/usr/bin/env python
"""Convert a VOCdevkit split to COCO-format JSON (images + instances file).

General-purpose VOC->COCO converter; also turns the mini-VOC stand-in
(tools/make_mini_voc.py) into a mini-COCO so the COCO e2e path — CocoDataset
JSON index, contiguous remap, eval.py's COCO protocol — gets the same
real-pixel end-to-end proof as the VOC path in this no-egress environment.

    python tools/voc_to_coco.py --voc_root /root/data/minivoc \
        --split test --out /root/data/minicoco --set_name val2017

Writes <out>/annotations/instances_<set_name>.json and symlinks (or copies)
the JPEGs into <out>/<set_name>/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficientdet_tpu.data.voc import VOC_CLASSES  # noqa: E402


def convert(voc_root: str, split: str, out: str, set_name: str,
            year: str = "2007", link: bool = True) -> dict:
    base = os.path.join(voc_root, f"VOC{year}")
    ids = [line.strip() for line in
           open(os.path.join(base, "ImageSets", "Main", f"{split}.txt"))
           if line.strip()]

    images, annotations = [], []
    ann_id = 1
    img_dir = os.path.join(out, set_name)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(out, "annotations"), exist_ok=True)

    for img_num, img_id in enumerate(ids, start=1):
        xml_path = os.path.join(base, "Annotations", f"{img_id}.xml")
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        w = int(size.find("width").text)
        h = int(size.find("height").text)
        file_name = f"{img_id}.jpg"
        images.append({"id": img_num, "file_name": file_name,
                       "width": w, "height": h})
        src = os.path.join(base, "JPEGImages", file_name)
        dst = os.path.join(img_dir, file_name)
        if not os.path.exists(dst):
            if link:
                os.symlink(os.path.abspath(src), dst)
            else:
                import shutil
                shutil.copy(src, dst)

        for obj in root.iter("object"):
            name = obj.find("name").text.strip().lower()
            if name not in VOC_CLASSES:
                continue
            bb = obj.find("bndbox")
            # VOC XML is 1-based inclusive; COCO is 0-based xywh with
            # x2 = x + w (the xywh->xyxy rule of reference
            # datasets/coco.py:107-108), so w = xmax - xmin keeps the
            # xyxy boxes bit-identical across both loaders
            x1 = float(bb.find("xmin").text) - 1
            y1 = float(bb.find("ymin").text) - 1
            x2 = float(bb.find("xmax").text) - 1
            y2 = float(bb.find("ymax").text) - 1
            bw, bh = x2 - x1, y2 - y1
            annotations.append({
                "id": ann_id, "image_id": img_num,
                "category_id": VOC_CLASSES.index(name) + 1,
                "bbox": [x1, y1, bw, bh], "area": bw * bh,
                "iscrowd": int((obj.find("difficult") is not None
                                and obj.find("difficult").text == "1")),
            })
            ann_id += 1

    coco = {
        "info": {"description": f"VOC{year} {split} converted to COCO"},
        "images": images,
        "annotations": annotations,
        "categories": [{"id": i + 1, "name": c, "supercategory": "object"}
                       for i, c in enumerate(VOC_CLASSES)],
    }
    ann_path = os.path.join(out, "annotations",
                            f"instances_{set_name}.json")
    with open(ann_path, "w") as f:
        json.dump(coco, f)
    return {"images": len(images), "annotations": len(annotations),
            "ann_file": ann_path}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voc_root", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", required=True)
    ap.add_argument("--set_name", default="val2017")
    ap.add_argument("--year", default="2007")
    ap.add_argument("--copy", action="store_true",
                    help="copy JPEGs instead of symlinking")
    args = ap.parse_args()
    stats = convert(args.voc_root, args.split, args.out, args.set_name,
                    args.year, link=not args.copy)
    print(f"wrote {stats['ann_file']}: {stats['images']} images, "
          f"{stats['annotations']} annotations")


if __name__ == "__main__":
    main()
