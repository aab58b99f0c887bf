"""Linear tracker: association, confidence dynamics, inpainting."""
import numpy as np

from leod_tpu.selftrain.tracker import LinearTracker, greedy_match


def _det(cx, cy, w=40, h=30, cls=0):
    return np.array([cx, cy, w, h, cls], np.float64)


def test_greedy_match_order():
    iou = np.array([[0.9, 0.2], [0.8, 0.7]])
    # row 1 first (higher conf): takes col 0; row 0 falls back to col 1
    m = greedy_match(iou, np.array([1, 0]), thresh=0.1)
    assert {tuple(r) for r in m.tolist()} == {(1, 0), (0, 1)}
    # row 0 first: takes col 0; row 1 takes col 1
    m = greedy_match(iou, np.array([0, 1]), thresh=0.1)
    assert {tuple(r) for r in m.tolist()} == {(0, 0), (1, 1)}


def test_track_through_sequence():
    trk = LinearTracker((240, 304))
    # object moving right at 5 px/frame
    for t in range(10):
        trk.update(t, _det(50 + 5 * t, 100)[None])
    trk.finish()
    assert trk.track_count == 1
    t0 = trk.tracklet_of_bbox(0)
    assert len(t0.bbox_idx) == 10
    assert t0.done is False            # survived to the end: unfinished
    np.testing.assert_allclose(t0.vxvy, [5, 0], atol=1e-6)


def test_confidence_decay_and_deletion():
    trk = LinearTracker((240, 304), min_conf=0.55, q=0.9)
    trk.update(0, _det(50, 100)[None])
    # 6 consecutive misses: 0.9^7 < 0.55 -> deleted
    for t in range(1, 8):
        trk.update(t, np.zeros((0, 5)))
    trk.finish()
    t0 = trk.tracklet_of_bbox(0)
    assert t0.done is True             # retired by confidence decay
    assert t0.conf < 0.55


def test_two_objects_stay_separate():
    trk = LinearTracker((240, 304))
    for t in range(6):
        dets = np.stack([_det(50 + 3 * t, 60, cls=0),
                         _det(200 - 3 * t, 180, cls=1)])
        trk.update(t, dets)
    trk.finish()
    assert trk.track_count == 2
    a = trk.tracklet_of_bbox(0)
    b = trk.tracklet_of_bbox(1)
    assert a is not b
    assert len(a.bbox_idx) == 6 and len(b.bbox_idx) == 6


def test_class_gate_blocks_association():
    trk = LinearTracker((240, 304))
    trk.update(0, _det(50, 100, cls=0)[None])
    # same location, different class -> new tracklet
    trk.update(1, _det(50, 100, cls=1)[None])
    trk.finish()
    assert trk.track_count == 2


def test_missed_frame_inpainting():
    trk = LinearTracker((240, 304))
    for t in range(4):
        trk.update(t, _det(50 + 5 * t, 100)[None])
    trk.update(4, np.zeros((0, 5)))            # miss
    trk.update(5, _det(50 + 25, 100)[None])    # recover
    trk.finish()
    t0 = trk.tracklet_of_bbox(0)
    # missed frame 4 got an inpainted predicted box at the extrapolation
    assert 4 in t0.missed_bbox
    np.testing.assert_allclose(t0.missed_bbox[4][:2], [70, 100], atol=1e-6)
    assert len(t0.bbox_idx) == 5


def test_confidence_recovery():
    trk = LinearTracker((240, 304), q=0.9)
    trk.update(0, _det(50, 100)[None])
    c0 = trk.tracklets[0].conf
    trk.update(1, _det(52, 100)[None])
    c1 = trk.tracklets[0].conf
    assert c1 > c0                    # hit raises confidence toward 1
    trk.update(2, np.zeros((0, 5)))
    assert abs(trk.tracklets[0].conf - c1 * 0.9) < 1e-12
