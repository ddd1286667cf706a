"""Evaluator tests: VOC AP matching semantics + COCO protocol sanity."""

import numpy as np
import pytest

from efficientdet_tpu.eval import (CocoEvaluator, compute_ap, compute_overlap,
                                   evaluate_detections, write_coco_results)


def test_compute_ap_perfect():
    # one detection, one GT, TP -> AP 1
    assert compute_ap(np.array([1.0]), np.array([1.0])) == 1.0


def test_compute_ap_half():
    # two GT, one TP detection -> recall 0.5 at precision 1 -> AP 0.5
    assert compute_ap(np.array([0.5]), np.array([1.0])) == 0.5


def test_compute_overlap_identity():
    b = np.array([[0.0, 0, 10, 10]])
    np.testing.assert_allclose(compute_overlap(b, b), [[1.0]])


def _dets(*rows):
    return np.asarray(rows, dtype=np.float64).reshape(-1, 5)


def _gts(*rows):
    return np.asarray(rows, dtype=np.float64).reshape(-1, 4)


def test_voc_evaluate_perfect_detection():
    dets = [[_dets([0, 0, 10, 10, 0.9])]]          # 1 image, 1 class
    anns = [[_gts([0, 0, 10, 10])]]
    aps = evaluate_detections(dets, anns, num_classes=1)
    assert aps[0] == (1.0, 1.0)


def test_voc_evaluate_duplicate_detection_is_fp():
    # second detection on the same GT counts as FP (greedy claim rule,
    # reference eval.py:218-224)
    dets = [[_dets([0, 0, 10, 10, 0.9], [0.5, 0, 10, 10, 0.8])]]
    anns = [[_gts([0, 0, 10, 10])]]
    ap, n = evaluate_detections(dets, anns, num_classes=1)[0]
    assert n == 1.0
    assert ap == 1.0  # TP comes first by score; envelope AP unaffected by tail FP


def test_voc_evaluate_low_iou_is_fp():
    dets = [[_dets([50, 50, 60, 60, 0.9])]]
    anns = [[_gts([0, 0, 10, 10])]]
    ap, _ = evaluate_detections(dets, anns, num_classes=1)[0]
    assert ap == 0.0


def test_voc_evaluate_empty_class():
    dets = [[_dets(), _dets([0, 0, 10, 10, 0.9])]]
    anns = [[_gts(), _gts([0, 0, 10, 10])]]
    aps = evaluate_detections(dets, anns, num_classes=2)
    assert aps[0] == (0.0, 0.0)
    assert aps[1] == (1.0, 1.0)


def test_voc_score_ordering_across_images():
    # image A: FP at score 0.9; image B: TP at score 0.8
    # cumulated order: FP first -> precision at TP = 1/2, recall 1 -> AP 0.5
    dets = [[_dets([100, 100, 110, 110, 0.9])],
            [_dets([0, 0, 10, 10, 0.8])]]
    anns = [[_gts()], [_gts([0, 0, 10, 10])]]
    ap, _ = evaluate_detections(dets, anns, num_classes=1)[0]
    assert ap == 0.5


# ----------------------------------------------------------------- COCO
def test_coco_perfect_all_thresholds():
    ev = CocoEvaluator(num_classes=2)
    gts = np.array([[0, 0, 50, 50], [60, 60, 100, 100]], dtype=np.float64)
    dets = np.array([[0, 0, 50, 50, 0.9], [60, 60, 100, 100, 0.8]])
    ev.add_image(dets, np.array([0, 1]), gts, np.array([0, 1]))
    stats = ev.summarize(verbose=False)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(1.0)


def test_coco_iou_between_50_and_75():
    # IoU ~0.6: counts at 0.5, 0.55, 0.6 thresholds only
    ev = CocoEvaluator(num_classes=1)
    gt = np.array([[0.0, 0, 100, 100]])
    det = np.array([[0.0, 0, 100, 75, 0.9]])  # IoU 0.75 exactly
    ev.add_image(det, np.array([0]), gt, np.array([0]))
    stats = ev.summarize(verbose=False)
    assert stats["AP50"] == pytest.approx(1.0)
    # thresholds 0.5..0.75 inclusive pass (6 of 10) — AP ~ 6/10 * 1.0
    assert stats["AP"] == pytest.approx(0.6, abs=0.06)


def test_coco_small_area_bucket():
    ev = CocoEvaluator(num_classes=1)
    gt = np.array([[0.0, 0, 10, 10]])        # area 100 -> small
    det = np.array([[0.0, 0, 10, 10, 0.9]])
    ev.add_image(det, np.array([0]), gt, np.array([0]))
    stats = ev.summarize(verbose=False)
    assert stats["AP_small"] == pytest.approx(1.0)
    assert stats["AP_medium"] == -1.0   # no medium GT -> NaN -> -1
    assert stats["AP_large"] == -1.0


def test_coco_fp_halves_precision():
    ev = CocoEvaluator(num_classes=1)
    gt = np.array([[0.0, 0, 50, 50]])
    dets = np.array([[0.0, 0, 50, 50, 0.8],
                     [200.0, 200, 250, 250, 0.9]])  # higher-score FP first
    ev.add_image(dets, np.array([0, 0]), gt, np.array([0]))
    stats = ev.summarize(verbose=False)
    # precision at the TP = 1/2 across all recall points
    assert stats["AP"] == pytest.approx(0.5, abs=0.01)


def test_write_coco_results(tmp_path):
    path = str(tmp_path / "res.json")
    write_coco_results(
        path, [42],
        [{"boxes": np.array([[10.0, 20, 30, 60]]),
          "scores": np.array([0.7]), "classes": np.array([1])}],
        label_to_coco_label={1: 18})
    import json
    data = json.load(open(path))
    assert data == [{"image_id": 42, "category_id": 18, "score": 0.7,
                     "bbox": [10.0, 20.0, 20.0, 40.0]}]
