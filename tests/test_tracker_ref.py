"""Differential test: leod_tpu LinearTracker vs the reference tracker.

The reference offline tracker (/root/reference/modules/tracking/linear.py,
tracker.py, utils.py) is dependency-free numpy, so it is imported directly
(modules/__init__.py is empty — nothing torch-side loads) and fuzzed
side-by-side against leod_tpu.selftrain.tracker.LinearTracker on random
detection streams. Agreement is exact: per-box tracklet identity grouping,
confidence, hits, is_gt, done flag, and the missed-box inpainting records.

VERDICT r3 item 2: "fuzz LinearTracker vs the reference on random
detection streams ... exact agreement on per-box keep/ignore/inpaint over
>=1k random sequences".
"""
from __future__ import annotations

import sys

import numpy as np
import pytest

from leod_tpu.selftrain.tracker import LinearTracker

REFERENCE_ROOT = "/root/reference"


def _import_reference_tracker():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from modules.tracking.linear import LinearTracker as RefLinearTracker
    return RefLinearTracker


def _random_stream(rng: np.random.Generator, img_hw, num_frames: int):
    """A detection stream with persistent moving objects, dropouts, and
    spurious one-off detections — the regime the pseudo-label tracker sees
    (reference pseudo_labeler.py feeds per-frame NMS outputs)."""
    h, w = img_hw
    num_obj = rng.integers(0, 6)
    objs = []
    for _ in range(num_obj):
        objs.append({
            # start sometimes outside so clamp-aware velocity triggers
            "c": rng.uniform([-0.15 * w, -0.15 * h],
                             [1.15 * w, 1.15 * h]),
            "v": rng.uniform(-0.06, 0.06, 2) * [w, h],
            "wh": rng.uniform([6, 6], [0.4 * w, 0.4 * h]),
            "cls": float(rng.integers(0, 3)),
            "p_drop": rng.uniform(0.0, 0.45),
            "gt_rate": rng.uniform(0.0, 0.5),
        })
    frames = []
    for _t in range(num_frames):
        dets, gts = [], []
        for o in objs:
            o["c"] = o["c"] + o["v"]
            if rng.uniform() < o["p_drop"]:
                continue
            jitter = rng.normal(0.0, 1.5, 2)
            whj = o["wh"] * rng.uniform(0.92, 1.08, 2)
            dets.append([o["c"][0] + jitter[0], o["c"][1] + jitter[1],
                         whj[0], whj[1], o["cls"]])
            gts.append(rng.uniform() < o["gt_rate"])
        for _ in range(rng.integers(0, 3)):  # spurious detections
            dets.append([rng.uniform(0, w), rng.uniform(0, h),
                         rng.uniform(4, 60), rng.uniform(4, 60),
                         float(rng.integers(0, 3))])
            gts.append(bool(rng.integers(0, 2)))
        dets = (np.asarray(dets, np.float64).reshape(-1, 5)
                if dets else np.empty((0, 5)))
        frames.append((dets, np.asarray(gts, bool)))
    return frames


def _run_pair(frames, img_hw):
    RefLinearTracker = _import_reference_tracker()
    ref = RefLinearTracker(img_hw=img_hw)
    ours = LinearTracker(img_hw=img_hw)
    for fi, (dets, is_gt) in enumerate(frames):
        ref.update(frame_idx=fi, dets=dets.copy(), is_gt=is_gt.copy())
        ours.update(frame_idx=fi, dets=dets.copy(), is_gt=is_gt.copy())
    ref.finish()
    ours.finish()
    return ref, ours


def _compare(ref, ours, seed):
    assert ref.bbox_count == ours.bbox_count, f"seed {seed}: bbox_count"
    assert ref.track_count == ours.track_count, f"seed {seed}: track_count"
    for bi in range(ref.bbox_count):
        in_ref = bi in ref.bbox_idx2tracker
        in_ours = bi in ours.bbox_idx2tracklet
        assert in_ref == in_ours, f"seed {seed}: box {bi} membership"
        if not in_ref:
            continue
        rt = ref.get_bbox_tracker(bi)
        ot = ours.tracklet_of_bbox(bi)
        assert rt.id == ot.id, f"seed {seed}: box {bi} track id"
        assert rt.done == ot.done, f"seed {seed}: box {bi} done"
        assert rt.is_gt == ot.is_gt, f"seed {seed}: box {bi} is_gt"
        np.testing.assert_allclose(
            rt.get_conf(bi), ot.conf_at(bi), rtol=0, atol=1e-12,
            err_msg=f"seed {seed}: box {bi} conf")
        assert rt.get_hits(bi) == ot.hits_at(bi), f"seed {seed}: hits"
        assert (sorted(rt.missed_bbox.keys())
                == sorted(ot.missed_bbox.keys())), \
            f"seed {seed}: box {bi} missed frames"
        for k in rt.missed_bbox:
            np.testing.assert_allclose(
                rt.missed_bbox[k], ot.missed_bbox[k], rtol=0, atol=1e-9,
                err_msg=f"seed {seed}: box {bi} missed bbox @{k}")


@pytest.mark.parametrize("chunk", range(8))
def test_tracker_matches_reference_fuzz(chunk):
    """1,024 random sequences (8 chunks x 128), exact agreement."""
    for i in range(128):
        seed = chunk * 128 + i
        rng = np.random.default_rng(seed)
        img_hw = (int(rng.integers(60, 260)), int(rng.integers(80, 340)))
        frames = _random_stream(rng, img_hw, int(rng.integers(1, 40)))
        ref, ours = _run_pair(frames, img_hw)
        _compare(ref, ours, seed)


def test_tracker_matches_reference_long_dense():
    """One long, dense sequence (many simultaneous tracklets, >16 so the
    argsort tie-order path is exercised)."""
    rng = np.random.default_rng(77777)
    img_hw = (240, 304)
    h, w = img_hw
    frames = []
    for _t in range(120):
        n = int(rng.integers(12, 24))
        dets = np.stack([
            rng.uniform(0, w, n), rng.uniform(0, h, n),
            rng.uniform(10, 70, n), rng.uniform(10, 70, n),
            rng.integers(0, 2, n).astype(np.float64)], axis=1)
        frames.append((dets, rng.integers(0, 2, n).astype(bool)))
    ref, ours = _run_pair(frames, img_hw)
    _compare(ref, ours, 77777)
