"""Differential test: the pseudo-label writer vs the reference EventSeqData.

The reference pipeline (modules/pseudo_labeler.py:94-407: per-frame
aggregation across streaming windows and TTA views -> TTA NMS merge ->
forward/backward tracker filtering -> ignore-region inpainting -> on-disk
labels.npz + index maps) is imported directly (with the heavy Lightning /
pycocotools deps stubbed, ref_shim.import_reference_pseudo) and driven
side-by-side with leod_tpu.selftrain.pseudo_labeler.SequenceRecorder on
identical synthetic prediction streams. The generated datasets must match
frame-by-frame: identical frame index maps and identical box sets (fields
compared to 1e-3, t/class_id exact).

VERDICT r3 item 3: "compare the generated labels.npz + index maps
frame-by-frame".
"""
from __future__ import annotations

import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(__file__))
import ref_shim  # noqa: E402

from leod_tpu.config import DatasetConfig, PostprocessConfig  # noqa: E402
from leod_tpu.data.labels import Boxes  # noqa: E402
from leod_tpu.selftrain.pseudo_labeler import (PseudoLabelConfig,  # noqa: E402
                                               SequenceRecorder)

EV_NAME = "stacked_histogram_dt=50_nbins=10"


def _make_tree(root: str, dst_name: str, num_frames: int) -> str:
    """Reference-format sequence directory with a tiny event h5."""
    import h5py
    seq = osp.join(root, dst_name, "train", "seq_000")
    ev_dir = osp.join(seq, "event_representations_v2", EV_NAME)
    os.makedirs(ev_dir)
    h5name = ("event_representations.h5" if dst_name == "gen1"
              else "event_representations_ds2_nearest.h5")
    with h5py.File(osp.join(ev_dir, h5name), "w") as f:
        f.create_dataset("data", data=np.zeros((num_frames, 1, 2, 2), np.uint8))
    os.makedirs(osp.join(root, dst_name, "val"))
    os.makedirs(osp.join(root, dst_name, "test"))
    return seq


def _gen_stream(rng: np.random.Generator, hw, num_frames: int,
                conf_floor: float):
    """Per-frame box arrays [N, 8] (t,x,y,w,h,cls,cls_conf,obj): a few
    linearly moving objects with dropouts (the tracker's regime), GT on a
    sparse subset of frames (t > 0), teacher predictions elsewhere."""
    h, w = hw
    gt_frames = set(rng.choice(num_frames,
                               size=rng.integers(0, num_frames // 6 + 1),
                               replace=False).tolist())
    objs = []
    for _ in range(rng.integers(1, 5)):
        objs.append({
            "c": rng.uniform([0.1 * w, 0.1 * h], [0.9 * w, 0.9 * h]),
            "v": rng.uniform(-4, 4, 2),
            "wh": rng.uniform([6, 6], [0.3 * w, 0.3 * h]),
            "cls": float(rng.integers(0, 2)),
            "p_drop": rng.uniform(0.0, 0.4),
        })
    frames = {}
    for f in range(num_frames):
        rows = []
        is_gt_frame = f in gt_frames
        for o in objs:
            o["c"] = o["c"] + o["v"]
            if not is_gt_frame and rng.uniform() < o["p_drop"]:
                continue
            cx, cy = o["c"] + rng.normal(0, 1.0, 2)
            bw, bh = o["wh"] * rng.uniform(0.95, 1.05, 2)
            x, y = cx - bw / 2, cy - bh / 2
            if x + bw < 1 or y + bh < 1 or x > w - 2 or y > h - 2:
                continue
            t = float(f * 1000 + 1) if is_gt_frame else 0.0
            conf = rng.uniform(conf_floor, 1.0, 2)
            rows.append([t, x, y, bw, bh, o["cls"], conf[0], conf[1]])
        if rows and (is_gt_frame or rng.uniform() < 0.9):
            rows = np.asarray(rows, np.float32)
            # Keep inputs inside the reference's valid domain: the
            # reference CRASHES if TTA NMS empties a frame
            # (pseudo_labeler.py:218 asserts len > 0; leod_tpu drops such
            # frames instead — intended divergence). Guarantee one box
            # above the merge confidence threshold per frame.
            prod = rows[:, 6] * rows[:, 7]
            if prod.max() < 0.45:
                rows[np.argmax(prod), 6:8] = 0.95
            frames[f] = rows
    return frames


def _views_of(frames, hw, num_frames, tflip_offset, rng, with_hflip,
              with_tflip):
    """TTA views as (is_hflip, is_tflip, {frame: rows}) triples. Pred boxes
    get per-view jitter (independent TTA predictions); GT rows are shared
    (every view re-reads the same labels)."""
    h, w = hw
    views = [(False, False, frames)]

    def _jitter(rows):
        rows = rows.copy()
        pseudo = rows[:, 0] == 0
        rows[pseudo, 1:3] += rng.normal(0, 0.8, (pseudo.sum(), 2)).astype(
            np.float32)
        return rows

    if with_hflip:
        flipped = {}
        for f, rows in frames.items():
            rows = _jitter(rows)
            rows[:, 1] = w - 1 - rows[:, 1] - rows[:, 3]
            flipped[f] = rows
        views.append((True, False, flipped))
    if with_tflip:
        # the tflip view reports view-local indices; update() adds
        # tflip_offset back (reference: pseudo_labeler.py:112-116)
        shifted = {f - tflip_offset: _jitter(rows)
                   for f, rows in frames.items()}
        views.append((False, True, shifted))
    return views


def _feed(recorder, ObjectLabels, views, hw, num_frames, window, is_ref):
    """Stream every view through the recorder in fixed-size windows."""
    for vi, (hflip, tflip, frames) in enumerate(views):
        all_idx = sorted(frames.keys())
        hi = (max(all_idx) + 1) if all_idx else num_frames
        for start in range(0, hi, window):
            idx = list(range(start, min(start + window, hi)))
            labels = []
            for f in idx:
                if f in frames:
                    rows = frames[f].copy()
                    if is_ref:
                        import torch
                        labels.append(ObjectLabels(torch.from_numpy(rows),
                                                   tuple(hw)))
                    else:
                        labels.append(Boxes(rows, hw))
                else:
                    labels.append(None)
            last = (start + window >= hi) and (vi == len(views) - 1)
            recorder.update(labels, list(idx), last,
                            [False] * len(idx), hflip, tflip,
                            recorder_tflip_offset(recorder, tflip))


def recorder_tflip_offset(recorder, tflip):
    return TFLIP_OFFSET if tflip else 0


TFLIP_OFFSET = 0  # set per-case below


def _run_case(tmp_path, seed, dst_name, with_hflip, with_tflip,
              track_method, inpaint, min_track_len):
    global TFLIP_OFFSET
    EventSeqData, _, ObjectLabels = ref_shim.import_reference_pseudo()
    rng = np.random.default_rng(seed)

    full_hw = (240, 304) if dst_name == "gen1" else (720, 1280)
    scale = 1 if dst_name == "gen1" else 2
    hw = (full_hw[0] // scale, full_hw[1] // scale)  # model-side resolution
    num_frames = int(rng.integers(20, 50))
    window = int(rng.integers(4, 9))
    TFLIP_OFFSET = -1 if dst_name == "gen1" else -2

    src_root = osp.join(tmp_path, "src")
    seq_dir = _make_tree(src_root, dst_name, num_frames)

    frames = _gen_stream(rng, hw, num_frames, conf_floor=0.55)
    views = _views_of(frames, hw, num_frames, TFLIP_OFFSET, rng,
                      with_hflip, with_tflip)

    filter_cfg = ref_shim._wrap({
        "min_track_len": min_track_len,
        "track_method": track_method,
        "inpaint": inpaint,
        "ignore_label": 1024,
    })
    postproc = ref_shim._wrap({"confidence_threshold": 0.4,
                               "nms_threshold": 0.45})

    # --- reference ---------------------------------------------------------
    ref = EventSeqData(path=seq_dir, scale_ratio=scale,
                       filter_config=filter_cfg, postproc_cfg=postproc)
    _feed(ref, ObjectLabels, views, hw, num_frames, window, is_ref=True)
    ref_out = osp.join(tmp_path, "out_ref", dst_name, "train")
    os.makedirs(ref_out)
    ref.save(ref_out, dst_name)

    # --- leod_tpu ----------------------------------------------------------
    pl_cfg = PseudoLabelConfig(min_track_len=min_track_len,
                               track_method=track_method, inpaint=inpaint,
                               tta_hflip=with_hflip, tta_tflip=with_tflip)
    pp = PostprocessConfig(confidence_threshold=0.4, nms_threshold=0.45)
    mine = SequenceRecorder(seq_dir, float(scale), pl_cfg, pp)
    # regenerate the views from an identical RNG stream? No — reuse the
    # SAME view data (deep copies: the reference mutates inputs in place)
    _feed(mine, ObjectLabels, views, hw, num_frames, window, is_ref=False)
    my_out = osp.join(tmp_path, "out_my")
    dst = DatasetConfig(name=dst_name, path=osp.join(src_root, dst_name),
                        resolution_hw=full_hw if dst_name == "gen1"
                        else (720, 1280),
                        downsample_by_factor_2=(dst_name == "gen4"))
    mine.save(my_out, dst)

    # --- compare -----------------------------------------------------------
    ref_seq = osp.join(ref_out, "seq_000")
    my_seq = osp.join(my_out, "train", "seq_000")
    ref_f2r = np.load(osp.join(ref_seq, "event_representations_v2", EV_NAME,
                               "objframe_idx_2_repr_idx.npy"))
    my_f2r = np.load(osp.join(my_seq, "event_representations_v2", EV_NAME,
                              "objframe_idx_2_repr_idx.npy"))
    np.testing.assert_array_equal(ref_f2r, my_f2r,
                                  err_msg=f"seed {seed}: frame index map")
    ref_npz = np.load(osp.join(ref_seq, "labels_v2", "labels.npz"))
    my_npz = np.load(osp.join(my_seq, "labels_v2", "labels.npz"))
    np.testing.assert_array_equal(
        ref_npz["objframe_idx_2_label_idx"], my_npz["objframe_idx_2_label_idx"],
        err_msg=f"seed {seed}: label index map")
    ref_lab, my_lab = ref_npz["labels"], my_npz["labels"]
    assert len(ref_lab) == len(my_lab), f"seed {seed}: total box count"

    f2l = ref_npz["objframe_idx_2_label_idx"]
    bounds = list(f2l) + [len(ref_lab)]
    for i in range(len(f2l)):
        lo, hi = bounds[i], bounds[i + 1]
        r, m = ref_lab[lo:hi], my_lab[lo:hi]
        # NMS output order can differ between kernels for tied scores:
        # compare per-frame box SETS via lexicographic row sort
        r_rows = np.stack([r[k].astype(np.float64) for k in r.dtype.names], 1)
        m_rows = np.stack([m[k].astype(np.float64) for k in m.dtype.names], 1)
        r_rows = r_rows[np.lexsort(r_rows.T[::-1])]
        m_rows = m_rows[np.lexsort(m_rows.T[::-1])]
        np.testing.assert_array_equal(
            r_rows[:, [0, 5]], m_rows[:, [0, 5]],
            err_msg=f"seed {seed}: frame {ref_f2r[i]} t/class_id")
        np.testing.assert_allclose(
            r_rows[:, 1:5], m_rows[:, 1:5], atol=1e-3, rtol=0,
            err_msg=f"seed {seed}: frame {ref_f2r[i]} geometry")
        np.testing.assert_allclose(
            r_rows[:, 6:], m_rows[:, 6:], atol=1e-5, rtol=0,
            err_msg=f"seed {seed}: frame {ref_f2r[i]} confidences")


CASES = [
    # (dst, hflip, tflip, track_method, inpaint, min_track_len)
    ("gen1", False, False, "forward", False, 6),
    ("gen1", True, False, "forward or backward", True, 6),   # production
    ("gen1", True, True, "forward or backward", True, 6),
    ("gen1", False, True, "forward", True, 4),
    ("gen1", True, True, "forward or backward", False, 8),
    ("gen4", True, False, "forward or backward", True, 6),
    ("gen4", True, True, "forward", True, 6),
    ("gen1", False, False, "forward", False, 0),              # filter off
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_pseudo_writer_matches_reference(tmp_path, case):
    dst, hflip, tflip, method, inpaint, mtl = CASES[case]
    for rep in range(4):
        _run_case(str(tmp_path / f"c{case}_{rep}"), seed=1000 * case + rep,
                  dst_name=dst, with_hflip=hflip, with_tflip=tflip,
                  track_method=method, inpaint=inpaint, min_track_len=mtl)
