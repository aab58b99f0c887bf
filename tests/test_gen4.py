"""Gen4-style pipeline: ds2 file naming, label downsampling, 3 classes."""
import dataclasses

import numpy as np
import pytest

from leod_tpu.config import dataset_preset
from leod_tpu.data.loader import StreamTrainLoader, open_split_sequences
from leod_tpu.data.sequence import EventSequence, list_sequence_dirs
from leod_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def gen4_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_gen4")
    # tiny gen4-like dataset: 96x128 full res, frames stored at 48x64
    generate_dataset(str(root), num_train=2, num_val=1, num_test=0,
                     num_reprs=24, hw=(96, 128), ds2=True, num_classes=3,
                     label_every=2, first_label_repr=11)
    return str(root)


def _cfg(root):
    return dataclasses.replace(
        dataset_preset("gen4"), path=root, resolution_hw=(96, 128),
        sequence_length=5)


def test_gen4_sequence_reading(gen4_root):
    cfg = _cfg(gen4_root)
    seq = EventSequence(list_sequence_dirs(gen4_root, "train")[0], cfg)
    ev = seq.read_ev_repr(0, 2)
    assert ev.shape == (2, 20, 48, 64)       # half-res frames
    lab, kept = seq.labels_at_repr_idx(11)
    assert lab is not None and kept
    # labels downsampled to frame resolution
    assert lab.size_hw == (48.0, 64.0)
    assert np.all(lab.x + lab.w <= 64)
    seq.close()


def test_gen4_stream_loader(gen4_root):
    cfg = _cfg(gen4_root)
    seqs = open_split_sequences(cfg, "train")
    loader = StreamTrainLoader(seqs, cfg, batch_size=2, seed=0)
    b = next(iter(loader))
    assert b["ev"].shape == (5, 2, 20, 48, 64)
    # tflip offset is -2 on gen4
    assert cfg.tflip_offset == -2


def test_gen4_recorder_and_verify(gen4_root, tmp_path):
    """Recorder save + structural verify on a downsampled (ds2) dataset —
    guards the loading-vs-full-resolution scaling contract."""
    import os
    from leod_tpu.config import PostprocessConfig
    from leod_tpu.data.labels import Boxes
    from leod_tpu.selftrain.pseudo_labeler import (PseudoLabelConfig,
                                                   SequenceRecorder)
    from leod_tpu.selftrain.verify import (score_pseudo_dataset,
                                           verify_pseudo_dataset)

    cfg = dataclasses.replace(_cfg(gen4_root), ratio=0.5)
    seq_dir = list_sequence_dirs(gen4_root, "train")[0]
    seq = EventSequence(seq_dir, cfg, label_ratio=0.5)
    pl = PseudoLabelConfig(min_track_len=0, obj_thresh=(0.0, 0.0, 0.0),
                           cls_thresh=(0.0, 0.0, 0.0))
    rec = SequenceRecorder(seq_dir, 2.0, pl, PostprocessConfig())
    labels = []
    hw = cfg.loading_hw
    for t in range(seq.num_ev_repr):
        gt, kept = seq.labels_at_repr_idx(t)
        if gt is not None and kept:
            labels.append(gt)                 # loading-res GT
        elif gt is not None:                  # withheld frame: fake pseudo
            arr = gt.arr.copy()
            arr[:, 0] = 0                     # stamp pseudo (t == 0)
            labels.append(Boxes(arr, hw))
        else:
            labels.append(None)
    rec.update(labels, list(range(seq.num_ev_repr)), True,
               [False] * seq.num_ev_repr, False, False, -2)
    save_dir = str(tmp_path / "pse_gen4")
    os.makedirs(os.path.join(save_dir, "train"))
    rec.save(save_dir, cfg)

    # structural verify must pass (GT retained; resolutions consistent)
    n = verify_pseudo_dataset(save_dir, cfg, sample_frac=1.0)
    assert n == 1
    # scoring vs withheld GT: the fake pseudo labels ARE the GT -> AR = 1
    m = score_pseudo_dataset(save_dir, cfg, pl, 3, cfg.classes)
    ars = [v for k, v in m.items() if "teacher_AR@50" in k]
    assert ars and all(a == 1.0 for a in ars)
    seq.close()
