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
