"""Spatial augmentor: frame/label consistency."""
import numpy as np

from leod_tpu.config import AugmentConfig, ZoomConfig
from leod_tpu.data.augment import (SpatialAugmentor, resize_nearest,
                                   rotate_frames_nearest)
from leod_tpu.data.labels import Boxes

HW = (64, 96)


def _sample(box=(20, 16, 30, 24)):
    """One-window sample with a bright rectangle matching the label."""
    ev = np.zeros((2, 4, *HW), np.uint8)
    x, y, w, h = box
    ev[:, :, y:y + h, x:x + w] = 200
    lab = Boxes(np.array([[1e6, x, y, w, h, 0, 1, 1]], np.float32), HW)
    return {"ev_repr": ev, "labels": [None, lab],
            "skipped_labels": [None, None]}


def _centroid(frame):
    ys, xs = np.nonzero(frame[0] > 100)
    return xs.mean(), ys.mean()


def test_resize_nearest_identity():
    x = np.random.default_rng(0).integers(0, 255, (3, 16, 20)).astype(np.uint8)
    np.testing.assert_array_equal(resize_nearest(x, (16, 20)), x)
    up = resize_nearest(x, (32, 40))
    assert up.shape == (3, 32, 40)
    np.testing.assert_array_equal(up[:, ::2, ::2], x)


def test_hflip_consistency():
    aug = SpatialAugmentor(HW, AugmentConfig(prob_hflip=1.0, zoom=ZoomConfig(
        prob=0.0)), np.random.default_rng(0))
    aug.randomize()
    s = _sample()
    out = aug.apply(s)
    lab = out["labels"][1]
    cx_f, _ = _centroid(out["ev_repr"][1])
    box_cx = lab.x[0] + lab.w[0] / 2
    assert abs(cx_f - box_cx) < 2.0          # box still covers the content


def test_zoom_out_consistency():
    cfg = AugmentConfig(prob_hflip=0.0, zoom=ZoomConfig(
        prob=1.0, zoom_in_weight=0.0, zoom_out_weight=1.0,
        zoom_out_min=1.5, zoom_out_max=1.5))
    aug = SpatialAugmentor(HW, cfg, np.random.default_rng(1))
    aug.randomize()
    assert aug.params.zoom_out is not None
    s = _sample()
    out = aug.apply(s)
    lab = out["labels"][1]
    assert lab is not None
    cx_f, cy_f = _centroid(out["ev_repr"][1])
    assert abs(cx_f - (lab.x[0] + lab.w[0] / 2)) < 2.5
    assert abs(cy_f - (lab.y[0] + lab.h[0] / 2)) < 2.5
    # content shrank by 1.5
    assert lab.w[0] < 30 / 1.4


def test_zoom_in_keeps_a_box():
    cfg = AugmentConfig(prob_hflip=0.0, zoom=ZoomConfig(
        prob=1.0, zoom_in_weight=1.0, zoom_out_weight=0.0,
        zoom_in_min=1.4, zoom_in_max=1.4))
    aug = SpatialAugmentor(HW, cfg, np.random.default_rng(2))
    aug.randomize()
    assert aug.params.zoom_in_factor == 1.4
    s = _sample()
    out = aug.apply(s)
    lab = out["labels"][1]
    assert lab is not None and len(lab) == 1   # crop kept the GT box
    cx_f, cy_f = _centroid(out["ev_repr"][1])
    assert abs(cx_f - (lab.x[0] + lab.w[0] / 2)) < 3.0
    assert abs(cy_f - (lab.y[0] + lab.h[0] / 2)) < 3.0
    # content grew by ~1.4
    assert lab.w[0] > 30 * 1.2


def test_rotation_consistency():
    cfg = AugmentConfig(prob_hflip=0.0, rotate_prob=1.0, rotate_min_deg=10,
                        rotate_max_deg=10, zoom=ZoomConfig(prob=0.0))
    aug = SpatialAugmentor(HW, cfg, np.random.default_rng(3))
    aug.randomize()
    assert abs(aug.params.rotate_deg) == 10
    s = _sample()
    out = aug.apply(s)
    lab = out["labels"][1]
    cx_f, cy_f = _centroid(out["ev_repr"][1])
    assert abs(cx_f - (lab.x[0] + lab.w[0] / 2)) < 3.0
    assert abs(cy_f - (lab.y[0] + lab.h[0] / 2)) < 3.0


def test_rotate_frames_identity():
    x = np.random.default_rng(4).integers(0, 255, (2, 16, 20)).astype(np.uint8)
    np.testing.assert_array_equal(rotate_frames_nearest(x, 0.0), x)
