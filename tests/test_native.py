"""Native (C++) data pipeline tests: build, decode parity, transform parity,
loader integration, and Python fallback.

The native library (efficientdet_tpu/native/edt_native.cpp) must be
numerically interchangeable with the Python Normalizer->Augmenter->Resizer
path (data/transforms.py) — these tests pin that equivalence.
"""

import os

import numpy as np
import pytest

from efficientdet_tpu import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native pipeline did not build here")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    shapes = [(375, 500), (500, 333), (64, 128), (512, 512)]
    paths = []
    for i, (h, w) in enumerate(shapes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(d / f"img{i}.jpg")
        cv2.imwrite(p, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_decode_matches_cv2(jpeg_dir):
    # Same libjpeg family: decodes should agree to within +-1 LSB.
    for p in jpeg_dir:
        ours = native.decode_rgb(p)
        ref = cv2.imread(p)[:, :, ::-1]
        assert ours.shape == ref.shape
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_image_dims(jpeg_dir):
    for p in jpeg_dir:
        h, w = cv2.imread(p).shape[:2]
        assert native.image_dims(p) == (w, h)


def _python_reference(path, size, flip):
    from efficientdet_tpu.data.transforms import Normalizer, Resizer
    img = cv2.imread(path)[:, :, ::-1].astype(np.float32) / 255.0
    if flip:
        img = np.ascontiguousarray(img[:, ::-1])
    s = {"img": img, "annot": np.zeros((0, 5), np.float32), "scale": 1.0}
    s = Normalizer()(s)
    s = Resizer(size)(s)
    return s["img"], s["scale"]


@pytest.mark.parametrize("size", [512, 256])
def test_batch_matches_python_transforms(jpeg_dir, size):
    flips = [False, True, False, True]
    imgs, scales, ok = native.decode_resize_batch(jpeg_dir, size, flips)
    assert ok.all()
    for i, p in enumerate(jpeg_dir):
        ref_img, ref_scale = _python_reference(p, size, flips[i])
        assert scales[i] == pytest.approx(ref_scale)
        # decode is +-1 LSB vs cv2; normalized that is ~1/(255*0.225)=0.018
        assert np.abs(imgs[i] - ref_img).max() < 0.02


def _splice_exif_orientation(jpeg_bytes: bytes, orientation: int) -> bytes:
    """Insert an APP1/EXIF segment with the given orientation after SOI."""
    tiff = (b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
            + (1).to_bytes(2, "big")                       # 1 IFD entry
            + (0x0112).to_bytes(2, "big")                  # orientation tag
            + (3).to_bytes(2, "big")                       # SHORT
            + (1).to_bytes(4, "big")                       # count
            + orientation.to_bytes(2, "big") + b"\x00\x00"
            + (0).to_bytes(4, "big"))                      # next IFD
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    return jpeg_bytes[:2] + app1 + jpeg_bytes[2:]


def test_exif_rotated_jpeg_falls_back(jpeg_dir, tmp_path):
    """cv2.imread applies EXIF rotation; the native decoder doesn't, so an
    EXIF-rotated image must be rejected (ok=0 -> Python fallback) rather
    than silently trained on unrotated pixels."""
    raw = open(jpeg_dir[0], "rb").read()
    rotated = str(tmp_path / "rot.jpg")
    with open(rotated, "wb") as f:
        f.write(_splice_exif_orientation(raw, 6))
    upright = str(tmp_path / "up.jpg")
    with open(upright, "wb") as f:
        f.write(_splice_exif_orientation(raw, 1))
    imgs, scales, ok = native.decode_resize_batch(
        [jpeg_dir[0], rotated, upright], 128)
    assert ok[0] and not ok[1] and ok[2]
    np.testing.assert_array_equal(imgs[0], imgs[2])


def test_non_jpeg_falls_back(jpeg_dir, tmp_path):
    png = str(tmp_path / "x.png")
    cv2.imwrite(png, np.zeros((32, 32, 3), np.uint8))
    imgs, scales, ok = native.decode_resize_batch([jpeg_dir[0], png], 128)
    assert ok[0] and not ok[1]
    assert np.all(imgs[1] == 0.0) and scales[1] == 1.0


class _PathDataset:
    """Minimal dataset exposing the native-loader protocol."""

    def __init__(self, paths, boxes):
        self.paths = paths
        self.boxes = boxes

    def __len__(self):
        return len(self.paths)

    def image_path(self, i):
        return self.paths[i]

    def load_annotations(self, i):
        return self.boxes[i]

    def __getitem__(self, i):  # python fallback path
        from efficientdet_tpu.data.transforms import (Normalizer, Resizer)
        img = cv2.imread(self.paths[i])[:, :, ::-1].astype(np.float32) / 255.0
        s = {"img": img, "annot": np.asarray(self.boxes[i], np.float32),
             "scale": 1.0}
        return Resizer(128)(Normalizer()(s))


def test_loader_native_boxes_match_python(jpeg_dir):
    from efficientdet_tpu.data.loader import DataLoader
    boxes = [np.array([[10, 10, 100, 80, 3]], np.float32)
             for _ in jpeg_dir]
    ds = _PathDataset(list(jpeg_dir), boxes)

    # flip_prob=0: boxes must equal the python Resizer scaling exactly.
    loader = DataLoader(ds, batch_size=len(jpeg_dir), shuffle=False,
                        max_boxes=8, native="on", image_size=128,
                        flip_prob=0.0)
    batch = next(iter(loader))
    for i, p in enumerate(jpeg_dir):
        w, h = native.image_dims(p)
        scale = 128.0 / max(w, h)
        np.testing.assert_allclose(batch["annotations"][i, 0, :4],
                                   boxes[i][0, :4] * scale, rtol=1e-6)
        assert batch["scales"][i] == pytest.approx(scale)

    # flip_prob=1: x-mirror against the ORIGINAL width, then scale.
    loader = DataLoader(ds, batch_size=len(jpeg_dir), shuffle=False,
                        max_boxes=8, native="on", image_size=128,
                        flip_prob=1.0)
    batch = next(iter(loader))
    for i, p in enumerate(jpeg_dir):
        w, h = native.image_dims(p)
        scale = 128.0 / max(w, h)
        x1, y1, x2, y2, lbl = boxes[i][0]
        expect = np.array([(w - x2) * scale, y1 * scale,
                           (w - x1) * scale, y2 * scale])
        np.testing.assert_allclose(batch["annotations"][i, 0, :4], expect,
                                   rtol=1e-6)
        assert batch["annotations"][i, 0, 4] == lbl


def test_loader_native_images_match_python_when_no_flip(jpeg_dir):
    from efficientdet_tpu.data.loader import DataLoader
    boxes = [np.zeros((0, 5), np.float32) for _ in jpeg_dir]
    ds = _PathDataset(list(jpeg_dir), boxes)
    loader = DataLoader(ds, batch_size=len(jpeg_dir), shuffle=False,
                        max_boxes=4, native="on", image_size=128,
                        flip_prob=0.0)
    batch = next(iter(loader))
    for i, p in enumerate(jpeg_dir):
        ref_img, _ = _python_reference(p, 128, False)
        assert np.abs(batch["images"][i] - ref_img).max() < 0.02


def test_eval_batches_native_matches_python(jpeg_dir):
    from efficientdet_tpu.data.loader import eval_batches, prefetch_iter
    boxes = [np.zeros((0, 5), np.float32) for _ in jpeg_dir]
    ds = _PathDataset(list(jpeg_dir), boxes)
    nat = list(prefetch_iter(eval_batches(ds, 3, image_size=128,
                                          native="auto")))
    py = list(eval_batches(ds, 3, image_size=0, native="off"))
    assert len(nat) == len(py) == 2
    for (i1, im1, s1), (i2, im2, s2) in zip(nat, py):
        assert i1 == i2
        assert im1.shape == im2.shape == (3, 128, 128, 3)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)
        assert np.abs(im1 - im2).max() < 0.02
