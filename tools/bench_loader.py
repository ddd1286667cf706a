#!/usr/bin/env python
"""Host data-pipeline throughput: native (C++) vs Python loader.

Generates a disposable JPEG corpus, then times end-to-end batch production
(decode + resize + flip + normalize + pad + collate) through both paths of
efficientdet_tpu.data.DataLoader. Prints one JSON line per mode.

Usage: python tools/bench_loader.py [--images 256] [--size 512] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class _Corpus:
    def __init__(self, paths, boxes, size):
        self.paths = paths
        self.boxes = boxes
        self._size = size

    def __len__(self):
        return len(self.paths)

    def image_path(self, i):
        return self.paths[i]

    def load_annotations(self, i):
        return self.boxes[i]

    def __getitem__(self, i):
        import cv2
        from efficientdet_tpu.data.transforms import (Augmenter, Normalizer,
                                                      Resizer)
        img = cv2.imread(self.paths[i])[:, :, ::-1].astype(np.float32) / 255.0
        s = {"img": img, "annot": np.asarray(self.boxes[i], np.float32),
             "scale": 1.0}
        s = Normalizer()(s)
        s = Augmenter(0.5)(s)
        return Resizer(self._size)(s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    import cv2
    from efficientdet_tpu import native
    from efficientdet_tpu.data import DataLoader

    tmp = tempfile.mkdtemp(prefix="edt_loader_bench_")
    rng = np.random.RandomState(0)
    paths, boxes = [], []
    for i in range(args.images):
        h = int(rng.randint(360, 640))
        w = int(rng.randint(360, 640))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
        boxes.append(np.array([[10, 10, w // 2, h // 2, 1]], np.float32))
    ds = _Corpus(paths, boxes, args.size)

    results = {}
    modes = [("python", "off")]
    if native.available():
        modes.append(("native", "on"))
    for name, flag in modes:
        loader = DataLoader(ds, args.batch, shuffle=True, max_boxes=16,
                            native=flag, image_size=args.size, flip_prob=0.5)
        n = 0
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            for b in loader:
                n += len(b["images"])
        dt = time.perf_counter() - t0
        results[name] = n / dt
        print(json.dumps({"metric": f"loader_{name}_images_per_sec",
                          "value": round(n / dt, 1), "unit": "images/sec"}))
    if "native" in results:
        print(json.dumps({"metric": "loader_native_speedup",
                          "value": round(results["native"]
                                         / results["python"], 2),
                          "unit": "x"}))


if __name__ == "__main__":
    main()
