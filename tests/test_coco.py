"""COCO AP evaluator: hand-computed golden cases + protocol behavior."""
import numpy as np

from leod_tpu.data.labels import PROPH_DTYPE
from leod_tpu.eval.coco import COCOEvaluator
from leod_tpu.eval.prophesee import (PropheseeEvaluator, evaluate_sequences,
                                     filter_boxes, match_times)


def _box(x, y, w, h):
    return np.array([[x, y, w, h]], np.float64)


def test_perfect_detection():
    ev = COCOEvaluator(1)
    ev.add_image(_box(10, 10, 50, 40), [0], _box(10, 10, 50, 40), [0], [0.9])
    s = ev.summarize()
    assert s["AP"] == 1.0 and s["AP_50"] == 1.0 and s["AP_75"] == 1.0


def test_iou_060_matches_3_thresholds():
    # gt 10x10 at (0,0); det shifted so IoU = 0.6: width overlap w s.t.
    # inter/(union) = 0.6 -> use det (0,0,10,10) vs gt (0,2.5,10,10):
    # inter = 75, union = 125 -> IoU = 0.6
    ev = COCOEvaluator(1)
    ev.add_image(_box(0, 2.5, 10, 40), [0], _box(0, 2.5, 10, 40), [0], [0.9])
    assert ev.summarize()["AP"] == 1.0
    ev = COCOEvaluator(1)
    ev.add_image(_box(0, 2.5, 10, 10), [0], _box(0, 0, 10, 10), [0], [0.9])
    s = ev.summarize()
    # matches at IoU thr 0.50, 0.55, 0.60 -> 3/10
    assert abs(s["AP"] - 0.3) < 1e-6
    assert s["AP_50"] == 1.0 and s["AP_75"] == 0.0


def test_false_positive_after_tp_keeps_ap1():
    ev = COCOEvaluator(1)
    ev.add_image(_box(10, 10, 50, 40), [0],
                 np.array([[10, 10, 50, 40], [200, 200, 30, 30]], np.float64),
                 [0, 0], [0.9, 0.5])
    assert ev.summarize()["AP"] == 1.0


def test_fp_before_tp_halves_precision():
    ev = COCOEvaluator(1)
    ev.add_image(_box(10, 10, 50, 40), [0],
                 np.array([[200, 200, 30, 30], [10, 10, 50, 40]], np.float64),
                 [0, 0], [0.9, 0.5])
    s = ev.summarize()
    # recall 1 reached at precision 1/2; envelope -> 0.5 at every rec thr
    assert abs(s["AP"] - 0.5) < 1e-6


def test_missed_gt_limits_recall():
    ev = COCOEvaluator(1)
    gts = np.array([[10, 10, 50, 40], [300, 300, 50, 40]], np.float64)
    ev.add_image(gts, [0, 0], _box(10, 10, 50, 40), [0], [0.9])
    s = ev.summarize()
    # recall caps at 0.5: rec thrs 0.0..0.5 get precision 1 (51 of 101)
    assert abs(s["AP"] - 51 / 101) < 1e-6


def test_class_confusion_is_fp():
    ev = COCOEvaluator(2)
    ev.add_image(_box(10, 10, 50, 40), [0], _box(10, 10, 50, 40), [1], [0.9])
    s = ev.summarize()
    assert s["AP"] == 0.0


def test_area_split():
    ev = COCOEvaluator(1)
    small = _box(0, 0, 20, 20)      # 400 < 32^2
    large = _box(100, 100, 100, 100)  # 10000 > 96^2
    ev.add_image(np.concatenate([small, large]), [0, 0],
                 np.concatenate([small, large]), [0, 0], [0.9, 0.8])
    s = ev.summarize()
    assert s["AP_S"] == 1.0 and s["AP_L"] == 1.0
    assert s["AP_M"] == -1.0   # no medium GT -> -1 (pycocotools convention)
    assert s["AP"] == 1.0


def _proph(t, boxes, cls, conf=1.0):
    out = np.zeros(len(boxes), PROPH_DTYPE)
    out["t"] = t
    arr = np.asarray(boxes, np.float64).reshape(-1, 4)
    out["x"], out["y"], out["w"], out["h"] = arr.T
    out["class_id"] = cls
    out["class_confidence"] = conf
    return out


def test_filter_boxes():
    b = np.zeros(4, PROPH_DTYPE)
    b["t"] = [400_000, 600_000, 600_000, 600_000]
    b["w"] = [50, 50, 5, 30]
    b["h"] = [50, 50, 50, 8]
    out = filter_boxes(b, 500_000, 30, 10)
    # row0 too early, row2 side<10, row3 side<10 -> only row1
    assert len(out) == 1 and out["w"][0] == 50


def test_match_times_tolerance():
    gt = _proph(1_000_000, [[0, 0, 50, 50]], [0])
    dt_near = _proph(1_040_000, [[0, 0, 50, 50]], [0])
    dt_far = _proph(1_060_000, [[0, 0, 50, 50]], [0])
    g, d = match_times(np.unique(gt["t"]), gt, dt_near)
    assert len(d[0]) == 1
    g, d = match_times(np.unique(gt["t"]), gt, dt_far)
    assert len(d[0]) == 0


def test_prophesee_end_to_end():
    # perfect predictions after 0.5s -> AP 1.0 overall and per class
    ev = PropheseeEvaluator("gen1", downsample_by_2=False)
    for i in range(3):
        t = 600_000 + i * 100_000
        gt = _proph(t, [[20, 20, 60, 40], [100, 50, 40, 35]], [0, 1])
        ev.add_labels([gt])
        ev.add_predictions([gt.copy()])
    m = ev.evaluate()
    assert m["AP"] == 1.0
    assert m["AP_car"] == 1.0 and m["AP_pedestrian"] == 1.0


def test_prophesee_filters_apply_to_predictions_too():
    gt = _proph(600_000, [[20, 20, 60, 40]], [0])
    # prediction too small -> filtered out -> zero detections -> AP 0
    dt = _proph(600_000, [[20, 20, 8, 8]], [0])
    m = evaluate_sequences([gt], [dt], camera="gen1")
    assert m["AP"] == 0.0
