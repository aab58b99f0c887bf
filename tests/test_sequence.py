"""Sequence reading + windowing over a synthetic Gen1-format dataset."""
import numpy as np
import pytest

from leod_tpu.config import dataset_preset
from leod_tpu.data.sequence import (EventSequence, RandomAccessSequence,
                                    WindowedSequence, list_sequence_dirs,
                                    split_ranges_with_guaranteed_labels)
from leod_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    generate_dataset(str(root), num_train=2, num_val=1, num_test=1,
                     num_reprs=48, label_every=2, first_label_repr=11)
    return str(root)


def _cfg(dataset):
    import dataclasses
    return dataclasses.replace(dataset_preset("gen1"), path=dataset)


def test_sequence_open(dataset):
    cfg = _cfg(dataset)
    dirs = list_sequence_dirs(dataset, "train")
    assert len(dirs) == 2
    seq = EventSequence(dirs[0], cfg)
    assert seq.num_ev_repr == 48
    ev = seq.read_ev_repr(0, 4)
    assert ev.shape == (4, 20, 240, 304) and ev.dtype == np.uint8
    assert ev.max() > 0
    lab, kept = seq.labels_at_repr_idx(11)
    assert kept and lab is not None and len(lab) == 2
    lab_none, _ = seq.labels_at_repr_idx(12)
    assert lab_none is None


def test_wsod_subsampling(dataset):
    cfg = _cfg(dataset)
    dirs = list_sequence_dirs(dataset, "train")
    seq = EventSequence(dirs[0], cfg, label_ratio=0.5)
    # every 2nd labeled frame kept
    assert len(seq.kept_objframe_idx) == (len(seq.all_objframe_idx) + 1) // 2
    # skipped frame still yields labels with kept=False
    skipped_obj = [i for i in seq.all_objframe_idx
                   if i not in seq.kept_objframe_idx][0]
    repr_idx = int(seq.objframe_idx_2_repr_idx[skipped_obj])
    lab, kept = seq.labels_at_repr_idx(repr_idx)
    assert lab is not None and not kept


def test_split_ranges():
    idx = np.array([5, 8, 11, 40, 43])
    ranges = split_ranges_with_guaranteed_labels(idx, window=5)
    assert ranges == [(1, 12), (36, 44)]
    # every labeled index is inside some range
    for i in idx:
        assert any(lo <= i < hi for lo, hi in ranges)


def test_windowed_sequence_full_coverage(dataset):
    cfg = _cfg(dataset)
    seq = EventSequence(list_sequence_dirs(dataset, "val")[0], cfg)
    win = WindowedSequence(seq, window=5)
    L = len(win)
    seen = []
    n_labels = 0
    for i in range(L):
        s = win[i]
        assert s["ev_repr"].shape == (5, 20, 240, 304)
        assert s["is_first_sample"] == (i == 0)
        assert s["is_last_sample"] == (i == L - 1)
        seen.extend([x for x in s["ev_idx"].tolist() if x >= 0])
        n_labels += sum(l is not None for l in s["labels"])
    # every repr from the start offset consumed exactly once, in order
    assert seen == sorted(set(seen))
    assert seen[-1] == seq.num_ev_repr - 1
    assert n_labels == len(seq.kept_objframe_idx)
    # padding only in the last window
    assert not win[0]["is_padded"].any() or L == 1


def test_windowed_time_flip(dataset):
    cfg = _cfg(dataset)
    seq = EventSequence(list_sequence_dirs(dataset, "val")[0], cfg)
    fwd = WindowedSequence(seq, window=5)
    bwd = WindowedSequence(seq, window=5, time_flip=True)
    assert len(bwd) == len(fwd)
    s = bwd[0]
    idx = [x for x in s["ev_idx"].tolist() if x >= 0]
    # reversed order, starting from the sequence end
    assert idx == sorted(idx, reverse=True)
    assert idx[0] == seq.num_ev_repr - 1
    # channel axis flipped relative to forward read
    raw = seq.read_ev_repr(seq.num_ev_repr - 1, seq.num_ev_repr)[0]
    np.testing.assert_array_equal(s["ev_repr"][0], raw[::-1])


def test_random_access(dataset):
    cfg = _cfg(dataset)
    seq = EventSequence(list_sequence_dirs(dataset, "train")[0], cfg)
    ra = RandomAccessSequence(seq, window=8)
    assert len(ra) > 0
    s = ra[0]
    assert s["ev_repr"].shape == (8, 20, 240, 304)
    assert s["is_first_sample"]
    # label present at the LAST timestep
    assert s["labels"][-1] is not None


def test_padded_sample(dataset):
    cfg = _cfg(dataset)
    seq = EventSequence(list_sequence_dirs(dataset, "val")[0], cfg)
    win = WindowedSequence(seq, window=5)
    p = win.padded_sample()
    assert p["is_padded"].all()
    assert p["ev_repr"].sum() == 0
    assert all(l is None for l in p["labels"])
