#!/usr/bin/env python
"""Inference demo — TPU-native replacement for reference demo.py.

    python demo.py --weight DIR_OR_PTH --file_name img.jpg --output out.png
    python demo.py --weight DIR_OR_PTH --cam            # webcam loop + FPS
    python demo.py --weight DIR_OR_PTH --file_name img.jpg --score_threshold 0.4

The whole image->detections path (decode, clip, NMS) runs on device with
fixed shapes; boxes are mapped back to original-image pixels on the host
(reference demo.py:71-130).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def parse_args():
    p = argparse.ArgumentParser(description="EfficientDet-TPU demo")
    p.add_argument("--weight", required=True,
                   help="checkpoint dir or reference .pth")
    p.add_argument("--network", default="efficientdet-d0")
    p.add_argument("--num_class", type=int, default=20)
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--file_name", default=None, help="input image path")
    p.add_argument("--output", default="docs/demo_output.png")
    p.add_argument("--cam", action="store_true", help="webcam/video loop")
    p.add_argument("--cam_source", default="0",
                   help="camera index or video file path for --cam")
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop the --cam loop after N frames (0 = unlimited)")
    p.add_argument("--no_display", action="store_true",
                   help="headless --cam: skip imshow, write annotated frames "
                        "to --output (as video if it ends in .avi/.mp4)")
    p.add_argument("--score_threshold", type=float, default=0.3)
    p.add_argument("--fused_backbone", action="store_true",
                   help="fused-Pallas MBConv serving backbone (TPU)")
    p.add_argument("--iou_threshold", type=float, default=0.5)
    p.add_argument("--dataset_classes", default="VOC",
                   choices=["VOC", "COCO", "none"])
    p.add_argument("--platform", default="auto",
                   help="jax platform pin (e.g. 'cpu'); flag, not env — a "
                        "site hook may pre-import jax before JAX_PLATFORMS")
    return p.parse_args()


class Detect:
    """Loads a checkpoint and serves per-image detection (reference demo.py:36)."""

    def __init__(self, args):
        import dataclasses
        import jax
        import jax.numpy as jnp
        from efficientdet_tpu import EFFICIENTDET, DetectorConfig
        from efficientdet_tpu.models import EfficientDet
        from efficientdet_tpu.train import make_eval_step
        from efficientdet_tpu.utils import checkpoint as ckpt

        input_size = (args.input_size
                      or EFFICIENTDET[args.network]["input_size"])
        # native dir config OR reference .pth parser-blob recovery
        # (reference demo.py:48-54) — flags only needed for bare state_dicts
        saved = ckpt.load_config(args.weight)
        cfg = saved or DetectorConfig(num_classes=args.num_class,
                                      network=args.network,
                                      input_size=input_size)
        cfg = dataclasses.replace(cfg.resolve(),
                                  threshold=args.score_threshold,
                                  iou_threshold=args.iou_threshold)
        self.cfg = cfg
        model = EfficientDet(config=cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
        self.variables = ckpt.load_weights(args.weight, dict(variables))
        self._step = jax.jit(make_eval_step(
            model, cfg,
            fused_backbone=getattr(args, 'fused_backbone',
                                   False)))
        self._jnp = jnp

        if args.dataset_classes == "VOC":
            from efficientdet_tpu.data import VOC_CLASSES
            self.label_names = list(VOC_CLASSES)
        else:
            self.label_names = None

    def process(self, img_rgb01: np.ndarray):
        """img (H, W, 3) float32 RGB in [0,1] -> (boxes, labels, scores) in
        original-image pixels."""
        from efficientdet_tpu.data import eval_transforms
        sample = eval_transforms(self.cfg.input_size)(
            {"img": img_rgb01, "annot": np.zeros((0, 5), np.float32)})
        det = self._step(self.variables,
                         self._jnp.asarray(sample["img"][None]))
        valid = np.asarray(det.valid[0])
        boxes = np.asarray(det.boxes[0])[valid] / sample["scale"]
        labels = np.asarray(det.classes[0])[valid]
        scores = np.asarray(det.scores[0])[valid]
        return boxes, labels, scores

    def camera(self, source="0", max_frames=0, no_display=False,
               output="docs/demo_cam.avi"):
        """Webcam / video-stream loop with FPS overlay (reference
        demo.py:132-170). ``source`` is a camera index or a video file path;
        ``no_display`` writes annotated frames to ``output`` instead of
        imshow (headless environments)."""
        import cv2
        from efficientdet_tpu.utils.visualization import draw_detections
        cap = cv2.VideoCapture(int(source) if source.isdigit() else source)
        if not cap.isOpened():
            raise RuntimeError(f"cannot open capture source {source!r}")
        writer = None
        frames = 0
        while True:
            t0 = time.time()
            ok, frame = cap.read()
            if not ok:
                break
            rgb = frame[:, :, ::-1].astype(np.float32) / 255.0
            boxes, labels, scores = self.process(rgb)
            frame = draw_detections(frame, boxes, labels, scores,
                                    self.label_names)
            fps = 1.0 / max(time.time() - t0, 1e-6)
            cv2.putText(frame, f"FPS: {fps:.1f}", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 255), 2)
            if no_display:
                if writer is None and output.rsplit(".", 1)[-1] in (
                        "avi", "mp4"):
                    os.makedirs(os.path.dirname(output) or ".",
                                exist_ok=True)
                    writer = cv2.VideoWriter(
                        output, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                        (frame.shape[1], frame.shape[0]))
                if writer is not None:
                    writer.write(frame)
                print(f"frame {frames}: {len(boxes)} detections, "
                      f"{fps:.1f} FPS")
            else:
                cv2.imshow("EfficientDet-TPU", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            frames += 1
            if max_frames and frames >= max_frames:
                break
        cap.release()
        if writer is not None:
            writer.release()
            print(f"wrote {output} ({frames} frames)")
        if not no_display:
            cv2.destroyAllWindows()


def main():
    args = parse_args()
    import jax

    from efficientdet_tpu.utils import jax_setup
    jax_setup.enable_compilation_cache()
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    det = Detect(args)
    if args.cam:
        det.camera(args.cam_source, args.max_frames, args.no_display,
                   args.output)
        return
    if not args.file_name:
        raise SystemExit("--file_name or --cam required")
    import cv2
    img = cv2.imread(args.file_name)
    if img is None:
        raise SystemExit(f"cannot read {args.file_name}")
    rgb = img[:, :, ::-1].astype(np.float32) / 255.0
    t0 = time.time()
    boxes, labels, scores = det.process(rgb)
    print(f"{len(boxes)} detections in {time.time() - t0:.3f}s")
    for b, l, s in zip(boxes, labels, scores):
        name = det.label_names[int(l)] if det.label_names else int(l)
        print(f"  {name}: {s:.3f} @ {[round(float(v), 1) for v in b]}")
    from efficientdet_tpu.utils.visualization import draw_detections
    out = draw_detections(img.copy(), boxes, labels, scores, det.label_names)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    cv2.imwrite(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
