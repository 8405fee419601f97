"""mAP evaluator tests: hand-checkable cases + invariants."""

import numpy as np
import pytest

from aquaculture_tpu.eval.map import average_precision, evaluate_map, match_image


def test_perfect_detections_map_one():
    gt = (np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], float), np.asarray([0, 1]))
    det = (gt[0].copy(), np.asarray([0.9, 0.8]), gt[1].copy())
    out = evaluate_map([det], [gt], num_classes=2)
    assert out["map50"] == pytest.approx(1.0)
    assert out["map"] == pytest.approx(1.0)


def test_wrong_class_is_fp():
    gt = (np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))
    det = (gt[0].copy(), np.asarray([0.9]), np.asarray([1]))
    out = evaluate_map([det], [gt], num_classes=2)
    assert out["map50"] == 0.0


def test_half_recall_ap():
    # 2 GTs, one perfect detection -> precision 1 at recall .5, AP50 ~ .5
    gt = (np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], float), np.asarray([0, 0]))
    det = (np.asarray([[0, 0, 10, 10]], float), np.asarray([0.9]), np.asarray([0]))
    out = evaluate_map([det], [gt], num_classes=1)
    # 101-pt interpolation: p=1 for r <= 0.5 (51 pts of 101)
    assert out["map50"] == pytest.approx(51 / 101, abs=1e-6)


def test_duplicate_detection_is_fp():
    gt = (np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))
    det = (
        np.asarray([[0, 0, 10, 10], [0.5, 0.5, 10, 10]], float),
        np.asarray([0.9, 0.8]),
        np.asarray([0, 0]),
    )
    tp = match_image(det[0], det[2], gt[0], gt[1], iou_thresholds=[0.5])
    assert tp[:, 0].tolist() == [True, False]  # second claim rejected


def test_iou_threshold_sweep_monotone():
    gt = (np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))
    det = (np.asarray([[1, 1, 11, 11]], float), np.asarray([0.9]), np.asarray([0]))
    out = evaluate_map([det], [gt], num_classes=1)
    # IoU ~0.68: TP at 0.5..0.65, FP above -> map50 = 1, map < 1
    assert out["map50"] == pytest.approx(1.0)
    assert 0 < out["map"] < 1.0


def test_average_precision_order_invariance():
    rng = np.random.default_rng(0)
    tp = rng.random((50, 10)) > 0.5
    conf = rng.random(50)
    a = average_precision(tp, conf, n_gt=30)
    perm = rng.permutation(50)
    b = average_precision(tp[perm], conf[perm], n_gt=30)
    np.testing.assert_allclose(a, b)
