"""Full augmentation-stack tests (bbox-aware geometric + photometric ops).

Parity target: the reference's albumentations pipeline
(reference datasets/augmentation.py:8-50). The load-bearing invariant is
pixel<->box consistency: after any geometric transform, a box must still
cover the object's pixels.
"""

import numpy as np
import pytest

from efficientdet_tpu.data import (CLAHE, HorizontalFlip, HueSaturationValue,
                                   LongestMaxSize, OneOf, PadIfNeeded,
                                   RandomBrightnessContrast, RandomFlip,
                                   RandomGamma, RandomResizedCrop, RGBShift,
                                   SquareResize, Transpose, VerticalFlip,
                                   get_augmentation)

cv2 = pytest.importorskip("cv2")


def make_sample(h=80, w=120, box=(20, 30, 60, 70), label=3):
    """Dark image with one bright rectangle exactly at `box`."""
    img = np.full((h, w, 3), 0.1, np.float32)
    x1, y1, x2, y2 = box
    img[y1:y2, x1:x2] = 0.9
    annot = np.array([[x1, y1, x2, y2, label]], np.float32)
    return {"img": img, "annot": annot, "scale": 1.0}


def bright_bbox(img, thresh=0.5):
    """Bounding box (x1, y1, x2, y2) of pixels brighter than thresh."""
    ys, xs = np.where(img[..., 0] > thresh)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                    np.float32)


def assert_box_matches_pixels(sample, tol=3.0):
    got = bright_bbox(sample["img"])
    np.testing.assert_allclose(sample["annot"][0, :4], got, atol=tol)


def test_longest_max_size_scales_boxes():
    s = LongestMaxSize(60)(make_sample())
    assert s["img"].shape == (40, 60, 3)
    assert s["scale"] == pytest.approx(0.5)
    np.testing.assert_allclose(s["annot"][0, :4], [10, 15, 30, 35])
    assert_box_matches_pixels(s, tol=2.0)


def test_pad_if_needed_centers_and_shifts_boxes():
    s = PadIfNeeded(100, 140)(make_sample())
    assert s["img"].shape == (100, 140, 3)
    np.testing.assert_allclose(s["annot"][0, :4], [30, 40, 70, 80])
    assert_box_matches_pixels(s)


def test_horizontal_flip_involution_and_boxes():
    s0 = make_sample()
    t = HorizontalFlip(p=1.0)
    s1 = t(s0)
    np.testing.assert_allclose(s1["annot"][0, :4], [60, 30, 100, 70])
    assert_box_matches_pixels(s1)
    s2 = t(s1)
    np.testing.assert_array_equal(s2["img"], s0["img"])
    np.testing.assert_allclose(s2["annot"], s0["annot"])


def test_vertical_flip_boxes():
    s = VerticalFlip(p=1.0)(make_sample())
    np.testing.assert_allclose(s["annot"][0, :4], [20, 10, 60, 50])
    assert_box_matches_pixels(s)


def test_random_flip_both_axes():
    rng = np.random.RandomState(0)
    t = RandomFlip(p=1.0, rng=rng)
    for _ in range(10):
        s = t(make_sample())
        assert_box_matches_pixels(s)
        a = s["annot"][0]
        assert (a[:4] >= 0).all() and a[2] <= 120 and a[3] <= 80


def test_transpose_swaps_axes_and_boxes():
    s = Transpose(p=1.0)(make_sample())
    assert s["img"].shape == (120, 80, 3)
    np.testing.assert_allclose(s["annot"][0, :4], [30, 20, 70, 60])
    assert s["annot"][0, 4] == 3
    assert_box_matches_pixels(s)


def test_random_resized_crop_boxes_follow_pixels():
    rng = np.random.RandomState(1)
    t = RandomResizedCrop(96, 96, scale=(0.5, 1.0), p=1.0, rng=rng)
    hits = 0
    for _ in range(20):
        s = t(make_sample())
        assert s["img"].shape == (96, 96, 3)
        if len(s["annot"]):
            a = s["annot"][0, :4]
            assert (a[:2] >= 0).all() and a[2] <= 96 and a[3] <= 96
            assert a[2] > a[0] and a[3] > a[1]
            # box must cover the bright pixels that survived the crop
            if (s["img"][..., 0] > 0.5).sum() > 16:
                got = bright_bbox(s["img"])
                assert a[0] <= got[0] + 3 and a[1] <= got[1] + 3
                assert a[2] >= got[2] - 3 and a[3] >= got[3] - 3
                hits += 1
    assert hits >= 5  # the object survives often enough to be meaningful


def test_random_resized_crop_drops_outside_boxes():
    # object in the top-left corner; force a crop of the bottom-right
    t = RandomResizedCrop(64, 64, p=1.0)
    s = make_sample(100, 100, box=(0, 0, 20, 20))
    t._sample_crop = lambda h, w: (50, 50, 40, 40)
    out = t(s)
    assert len(out["annot"]) == 0


def test_random_resized_crop_min_visibility():
    # crop keeps only the right half of the box
    t = RandomResizedCrop(50, 50, p=1.0, min_visibility=0.9)
    t._sample_crop = lambda h, w: (40, 20, 50, 50)
    out = t(make_sample(100, 100, box=(20, 30, 60, 70)))
    assert len(out["annot"]) == 0  # ~half visible < 0.9
    t2 = RandomResizedCrop(50, 50, p=1.0, min_visibility=0.1)
    t2._sample_crop = lambda h, w: (40, 20, 50, 50)
    out2 = t2(make_sample(100, 100, box=(20, 30, 60, 70)))
    assert len(out2["annot"]) == 1


@pytest.mark.parametrize("t", [
    RandomBrightnessContrast(0.5, 0.4, rng=np.random.RandomState(2)),
    RandomGamma((50, 150), rng=np.random.RandomState(3)),
    RGBShift(20, 15, 15, rng=np.random.RandomState(4)),
    HueSaturationValue(5, 5, rng=np.random.RandomState(5)),
    CLAHE(p=1.0, rng=np.random.RandomState(6)),
])
def test_photometric_preserves_geometry(t):
    s0 = make_sample()
    s = t(s0)
    assert s["img"].shape == s0["img"].shape
    assert s["img"].dtype == np.float32
    assert s["img"].min() >= 0.0 and s["img"].max() <= 1.0
    np.testing.assert_array_equal(s["annot"], s0["annot"])


def test_photometric_changes_pixels():
    s0 = make_sample()
    s = RandomBrightnessContrast(0.5, 0.4,
                                 rng=np.random.RandomState(2))(s0)
    assert np.abs(s["img"] - s0["img"]).max() > 0.01


def test_clahe_equalizes_low_contrast():
    rng = np.random.RandomState(0)
    img = (0.45 + 0.1 * rng.rand(64, 64, 3)).astype(np.float32)
    s = CLAHE(p=1.0)({"img": img, "annot": np.zeros((0, 5), np.float32)})
    assert s["img"].std() > img.std()  # contrast expanded


def test_one_of_picks_exactly_one():
    calls = []

    def mk(tag):
        def t(sample):
            calls.append(tag)
            return sample
        return t

    rng = np.random.RandomState(7)
    t = OneOf([mk("a"), mk("b")], p=1.0, rng=rng)
    for _ in range(10):
        n0 = len(calls)
        t(make_sample())
        assert len(calls) == n0 + 1
    assert {"a", "b"} == set(calls)


def test_get_augmentation_test_phase():
    tf = get_augmentation("test", width=64, height=64)
    s = tf(make_sample())
    assert s["img"].shape == (64, 64, 3)
    # normalized output: ImageNet mean subtracted -> negative values exist
    assert s["img"].min() < 0
    a = s["annot"][0]
    np.testing.assert_allclose(a[:4], [20 * 64 / 120, 30 * 64 / 80,
                                       60 * 64 / 120, 70 * 64 / 80],
                               rtol=1e-5)


def test_get_augmentation_train_pipeline_runs_and_is_deterministic():
    tf1 = get_augmentation("train", width=64, height=64, seed=11)
    tf2 = get_augmentation("train", width=64, height=64, seed=11)
    outs1 = [tf1(make_sample()) for _ in range(8)]
    outs2 = [tf2(make_sample()) for _ in range(8)]
    for s1, s2 in zip(outs1, outs2):
        assert s1["img"].shape == (64, 64, 3)
        np.testing.assert_array_equal(s1["img"], s2["img"])
        np.testing.assert_array_equal(s1["annot"], s2["annot"])
        for a in s1["annot"]:
            assert (a[:2] >= 0).all() and a[2] <= 64 and a[3] <= 64
            assert a[2] > a[0] and a[3] > a[1]


def test_get_augmentation_rejects_unknown_phase():
    with pytest.raises(ValueError):
        get_augmentation("nope")


def test_train_driver_accepts_full_augment():
    """train.py --augment full builds a working pipeline over synthetic."""
    from efficientdet_tpu.data import SyntheticDetection, collate
    tf = get_augmentation("train", width=64, height=64, seed=1)
    ds = SyntheticDetection(length=2, image_size=96, num_classes=4,
                            transform=tf, seed=2)
    batch = collate([ds[0], ds[1]], max_boxes=8)
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["annotations"].shape == (2, 8, 5)
