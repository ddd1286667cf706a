"""Demo driver tests: image path and the camera/video loop.

Covers reference demo.py's two branches (process: demo.py:71-130, camera:
demo.py:132-170). The camera loop is exercised headless against a real
cv2.VideoCapture stream (a generated video file) — same decode/loop/draw
code as a webcam, minus the physical device.
"""

import argparse
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

SIZE = 128


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax
    from efficientdet_tpu import DetectorConfig
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.train import OptimizerConfig, create_train_state
    from efficientdet_tpu.utils import checkpoint as ckpt

    cfg = DetectorConfig(num_classes=4, network="efficientdet-d0",
                         input_size=SIZE).resolve()
    model = EfficientDet(config=cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), SIZE,
                               OptimizerConfig(learning_rate=1e-3))
    root = str(tmp_path_factory.mktemp("demo_ckpt"))
    ckpt.save_checkpoint(root, state, cfg, epoch=0)
    return root


def _make_detect(tiny_ckpt, score_threshold=0.0):
    import demo

    args = argparse.Namespace(
        weight=tiny_ckpt, network="efficientdet-d0", num_class=4,
        input_size=None, score_threshold=score_threshold, iou_threshold=0.5,
        dataset_classes="none")
    return demo.Detect(args)


def test_demo_process_image(tiny_ckpt):
    det = _make_detect(tiny_ckpt)
    rng = np.random.RandomState(0)
    img = rng.rand(160, 200, 3).astype(np.float32)  # non-square original
    boxes, labels, scores = det.process(img)
    assert boxes.shape[1] == 4 and len(boxes) == len(labels) == len(scores)
    if len(boxes):
        # boxes are in original-image pixels after the /scale mapping
        assert float(boxes.max()) <= 200.0 + 1e-3
        assert float(boxes.min()) >= -1e-3


def test_demo_camera_loop_headless(tiny_ckpt, tmp_path):
    video = str(tmp_path / "stream.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                             (96, 64))
    assert writer.isOpened()
    rng = np.random.RandomState(1)
    for _ in range(4):
        writer.write(rng.randint(0, 255, (64, 96, 3), dtype=np.uint8))
    writer.release()

    det = _make_detect(tiny_ckpt)
    out = str(tmp_path / "annotated.avi")
    det.camera(source=video, max_frames=3, no_display=True, output=out)
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3


def test_demo_camera_bad_source(tiny_ckpt):
    det = _make_detect(tiny_ckpt)
    with pytest.raises(RuntimeError, match="cannot open capture source"):
        det.camera(source="/nonexistent/video.avi", max_frames=1,
                   no_display=True)
