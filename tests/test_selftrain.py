"""Self-training components: filters, recorder round-trip, dataset writer."""
import dataclasses
import os

import numpy as np
import pytest

from leod_tpu.config import dataset_preset
from leod_tpu.data.labels import Boxes
from leod_tpu.data.sequence import EventSequence, list_sequence_dirs
from leod_tpu.data.synthetic import generate_dataset
from leod_tpu.config import PostprocessConfig
from leod_tpu.selftrain.filters import (filter_pred_boxes_xyxy,
                                        filter_with_thresholds,
                                        pred_to_label, subsample_label_idx)
from leod_tpu.selftrain.pseudo_labeler import (PseudoLabelConfig,
                                               SequenceRecorder,
                                               tta_merge_nms)
from leod_tpu.selftrain.verify import verify_pseudo_dataset

HW = (240.0, 304.0)


def test_subsample_label_idx():
    assert subsample_label_idx(10, use_every=1) == tuple(range(10))
    idx = subsample_label_idx(10, use_every=3)
    assert idx == (1, 4, 7, 9)       # skips frame 0, always includes last
    idx = subsample_label_idx(10, remove_every=5)
    assert 0 not in idx and 5 not in idx and 9 in idx


def test_filter_pred_boxes():
    xyxy = np.array([
        [10, 10, 60, 50],        # fine
        [-20, 10, 2, 50],        # clipped to w=2+ -> too thin (<5)
        [0, 0, 300, 30],         # wider than 90% of 304 -> dropped
        [290, 10, 400, 60],      # clipped into frame, w=13 -> kept
    ], np.float64)
    clipped, keep = filter_pred_boxes_xyxy(xyxy, "gen1")
    np.testing.assert_array_equal(keep, [True, False, False, True])
    assert clipped[3, 2] == 303.0


def test_per_class_thresholds():
    scores = np.array([0.5, 0.5, 0.2])
    cls = np.array([0, 1, 1])
    m = filter_with_thresholds(scores, cls, (0.6, 0.3))
    np.testing.assert_array_equal(m, [False, True, False])


def test_pred_to_label():
    pred = np.array([
        # x1, y1, x2, y2, obj, cls_conf, cls_id
        [10, 10, 60, 50, 0.9, 0.8, 0.0],
        [10, 10, 60, 50, 0.2, 0.8, 0.0],   # low obj -> dropped
    ], np.float32)
    lab = pred_to_label(pred, HW, obj_thresh=0.5, cls_thresh=0.5)
    assert len(lab) == 1
    assert lab.is_pseudo().all()           # t == 0
    assert lab.x[0] == 10 and lab.w[0] == 50
    assert lab.objectness[0] == pytest.approx(0.9)
    assert lab.class_confidence[0] == pytest.approx(0.8)


def test_tta_merge_keeps_gt():
    gt = Boxes(np.array([[5e6, 10, 10, 50, 40, 0, 1, 1]], np.float32), HW)
    dup = np.array([
        [0, 10, 10, 50, 40, 0, 0.9, 0.9],
        [0, 11, 11, 50, 40, 0, 0.8, 0.8],   # duplicate -> suppressed
        [0, 200, 100, 30, 30, 1, 0.9, 0.9],
    ], np.float32)
    pse = Boxes(dup, HW)
    out = tta_merge_nms([gt, pse], conf_threshold=0.5, nms_threshold=0.45)
    assert len(out[0]) == 1                  # GT untouched
    assert len(out[1]) == 2                  # NMS merged the duplicate


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_st")
    generate_dataset(str(root), num_train=1, num_val=0, num_test=0,
                     num_reprs=32, label_every=2, first_label_repr=11)
    return str(root)


def test_recorder_roundtrip_and_verify(synth_root, tmp_path):
    """Feed GT + synthetic pseudo labels through the recorder, save the
    dataset, re-read it, verify structure."""
    dst = dataclasses.replace(dataset_preset("gen1"), path=synth_root,
                              ratio=0.5)
    seq_dir = list_sequence_dirs(synth_root, "train")[0]
    seq = EventSequence(seq_dir, dst, label_ratio=0.5)
    pl = PseudoLabelConfig(min_track_len=2, obj_thresh=(0.0, 0.0),
                           cls_thresh=(0.0, 0.0))
    rec = SequenceRecorder(seq_dir, 1.0, pl, PostprocessConfig())

    # stream windows of 8, recording GT at kept frames and a fake moving
    # pseudo box elsewhere (long track -> survives filtering)
    L = 8
    for w0 in range(0, 32, L):
        labels = []
        for t in range(w0, w0 + L):
            gt, kept = seq.labels_at_repr_idx(t)
            if gt is not None and kept:
                labels.append(gt)
            else:
                arr = np.array([[0, 50 + t, 60, 40, 35, 0, 0.9, 0.9]],
                               np.float32)
                labels.append(Boxes(arr, HW))
        rec.update(labels, list(range(w0, w0 + L)),
                   is_last_sample=(w0 + L >= 32), is_padded=[False] * L,
                   is_hflip=False, is_tflip=False, tflip_offset=-1)

    save_dir = str(tmp_path / "pse")
    os.makedirs(os.path.join(save_dir, "train"))
    rec.save(save_dir, dst)

    # re-read through the standard reader
    pse_dst = dataclasses.replace(dst, path=save_dir, ratio=-1.0)
    pse = EventSequence(os.path.join(save_dir, "train",
                                     os.path.basename(seq_dir)), pse_dst)
    assert pse.num_ev_repr == 32             # h5 symlinked
    # every frame has some label now (pseudo-densified)
    assert len(pse.objframe_idx_2_repr_idx) >= len(seq.objframe_idx_2_repr_idx)
    # GT frames retained; structural verification passes
    n = verify_pseudo_dataset(save_dir, dst, sample_frac=1.0)
    assert n == 1
    # the long pseudo track was NOT marked ignore
    some_pse = pse.frame_labels[0]
    pse.close()
    seq.close()


def test_recorder_short_track_marked_ignore(synth_root, tmp_path):
    dst = dataclasses.replace(dataset_preset("gen1"), path=synth_root)
    seq_dir = list_sequence_dirs(synth_root, "train")[0]
    pl = PseudoLabelConfig(min_track_len=6, track_method="forward",
                           inpaint=False, obj_thresh=(0.0, 0.0),
                           cls_thresh=(0.0, 0.0))
    rec = SequenceRecorder(seq_dir, 1.0, pl, PostprocessConfig())
    # a class-1 box appears ONCE at frame 5 (short track, gets retired by
    # the later frames), plus a persistent class-0 box through frame 31
    # that keeps the tracker running (and survives filtering itself)
    labels = [None] * 32
    for t in range(5, 32):
        arr = [[0, 50.0 + t, 60, 40, 35, 0, 0.9, 0.9]]
        if t == 5:
            arr.append([0, 200, 100, 30, 30, 1, 0.9, 0.9])
        labels[t] = Boxes(np.array(arr, np.float32), HW)
    rec.update(labels, list(range(32)), True, [False] * 32, False, False, -1)
    save_dir = str(tmp_path / "pse2")
    os.makedirs(os.path.join(save_dir, "train"))
    rec.save(save_dir, dst)
    pse_dst = dataclasses.replace(dst, path=save_dir)
    pse = EventSequence(os.path.join(save_dir, "train",
                                     os.path.basename(seq_dir)), pse_dst)
    # frame 5 (objframe 0): the class-1 box is marked ignore, class-0 kept
    lab = pse.frame_labels[0]
    ignored = lab.is_ignore(1024)
    assert ignored.sum() == 1
    kept = lab.select(~ignored)
    assert (kept.class_id == 0).all()
    # later frames: persistent box kept as-is
    lab_last = pse.frame_labels[len(pse.frame_labels) - 1]
    assert not lab_last.is_ignore(1024).any()
    pse.close()
