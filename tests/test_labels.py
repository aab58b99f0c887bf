"""Label-container round-trip tests (mirrors the reference's only inline
micro-tests, data/genx_utils/labels.py:752-775, plus extra coverage)."""
import numpy as np
import pytest

from leod_tpu.data.labels import (BBOX_DTYPE, Boxes, FrameLabels,
                                  pad_yolox_batch)


def _mk_boxes():
    size = (240.0, 304.0)
    arr = np.array([
        # t, x, y, w, h, cls, cls_conf, obj
        [9.1e6, 195.0, 140.0, 52.0, 38.0, 0.0, 1.0, 1.0],
        [9.1e6, 20.0, 30.0, 40.0, 50.0, 1.0, 0.9, 0.8],
    ], np.float32)
    return Boxes(arr, size)


def test_zoom_out_roundtrip():
    b = _mk_boxes()
    x0y0, f = (42, 52), 1.321398913860321
    out = b.zoom_out(x0y0, f).unzoom_out(x0y0, f)
    np.testing.assert_allclose(out.arr, b.arr, atol=1e-3)


def test_zoom_in_roundtrip():
    # roundtrip only holds for boxes fully inside the zoom window, as in the
    # reference micro-test (labels.py:765-769)
    b = _mk_boxes().select(np.array([0]))
    x0y0, f = (42, 52), 1.321398913860321
    out = b.zoom_in(x0y0, f).unzoom_in(x0y0, f)
    np.testing.assert_allclose(out.arr, b.arr, atol=1e-3)


def test_flip_roundtrip():
    b = _mk_boxes()
    out = b.flip_lr().flip_lr()
    np.testing.assert_array_equal(out.arr, b.arr)


def test_flip_geometry():
    b = _mk_boxes()
    f = b.flip_lr()
    # x' = W - 1 - x - w
    np.testing.assert_allclose(f.x, 304 - 1 - b.x - b.w)
    np.testing.assert_allclose(f.w, b.w)


def test_rotate_identity():
    b = _mk_boxes()
    out = b.rotate(0.0)
    np.testing.assert_allclose(out.arr, b.arr, atol=1e-4)


def test_rotate_90_shapes():
    b = _mk_boxes()
    out = b.rotate(5.0)
    assert np.all(out.w > 0) and np.all(out.h > 0)
    assert np.all(out.x >= 0) and np.all(out.x + out.w <= 304 - 1 + 1e-3)


def test_clamp():
    arr = np.array([[1e6, -10.0, -5.0, 40.0, 30.0, 0, 1, 1]], np.float32)
    b = Boxes(arr, (240, 304)).clamped_to_frame()
    assert b.x[0] == 0 and b.y[0] == 0
    assert b.w[0] == pytest.approx(30.0)
    assert b.h[0] == pytest.approx(25.0)


def test_yolox_export_center_format():
    b = _mk_boxes()
    y = b.to_yolox()
    np.testing.assert_allclose(y[:, 1], b.x + 0.5 * b.w)
    np.testing.assert_allclose(y[:, 2], b.y + 0.5 * b.h)
    np.testing.assert_allclose(y[:, 0], b.class_id)


def test_pad_batch():
    b = _mk_boxes()
    out = pad_yolox_batch([b, None, b.select(np.array([0]))], max_gt=4)
    assert out.shape == (3, 4, 7)
    assert np.all(out[1] == 0)
    # the reference identifies padding rows by sum==0
    assert (out.sum(-1) > 0).sum() == 3


def test_structured_roundtrip():
    b = _mk_boxes()
    s = b.to_structured()
    assert s.dtype == BBOX_DTYPE
    b2 = Boxes.from_structured(s, b.size_hw)
    np.testing.assert_allclose(b2.arr, b.arr, rtol=1e-6)


def test_pseudo_vs_gt():
    arr = np.array([
        [0.0, 1, 1, 5, 5, 0, 1, 1],      # pseudo (t == 0)
        [5e6, 1, 1, 5, 5, 0, 1, 1],      # GT
    ], np.float32)
    b = Boxes(arr, (240, 304))
    np.testing.assert_array_equal(b.is_pseudo(), [True, False])
    np.testing.assert_array_equal(b.is_gt(), [False, True])


def test_frame_labels_indexing():
    labels = np.zeros(5, dtype=BBOX_DTYPE)
    labels["t"] = [100, 100, 200, 300, 300]
    labels["x"] = np.arange(5)
    labels["w"] = 10
    labels["h"] = 10
    f2l = np.array([0, 2, 3])
    fl = FrameLabels.from_structured(labels, f2l, (240, 304))
    assert len(fl) == 3
    assert len(fl[0]) == 2 and len(fl[1]) == 1 and len(fl[2]) == 2
    np.testing.assert_allclose(fl[2].x, [3, 4])


def test_frame_labels_downsample():
    labels = np.zeros(2, dtype=BBOX_DTYPE)
    labels["t"] = [100, 100]
    labels["x"] = [20, 40]
    labels["y"] = [10, 10]
    labels["w"] = [40, 40]
    labels["h"] = [40, 40]
    fl = FrameLabels.from_structured(labels, np.array([0]), (720, 1280),
                                     downsample_factor=2)
    b = fl[0]
    assert b.size_hw == (360.0, 640.0)
    np.testing.assert_allclose(b.x, [10, 20])
    np.testing.assert_allclose(b.w, [20, 20])
