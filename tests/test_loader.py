"""Loaders: slot continuity, eval coverage, harvesting."""
import numpy as np
import pytest

import dataclasses

from leod_tpu.config import dataset_preset
from leod_tpu.data.loader import (EvalStreamLoader, MixedTrainLoader,
                                  RandomTrainLoader, StreamTrainLoader,
                                  harvest_frames, open_split_sequences,
                                  pyramid_indices)
from leod_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_loader")
    generate_dataset(str(root), num_train=3, num_val=4, num_test=0,
                     num_reprs=40, label_every=3, first_label_repr=11,
                     hw=(64, 96))
    return str(root)


def _cfg(dataset, L=5):
    return dataclasses.replace(dataset_preset("gen1"), path=dataset,
                               resolution_hw=(64, 96), sequence_length=L)


def test_pyramid_indices():
    g = pyramid_indices(3)
    assert [next(g) for _ in range(8)] == [0, 1, 2, 2, 1, 0, 0, 1]


def test_stream_loader_slot_continuity(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "train")
    loader = StreamTrainLoader(seqs, cfg, batch_size=2, seed=0)
    it = iter(loader)
    last_idx = [None, None]
    n_first = 0
    for _ in range(12):
        b = next(it)
        assert b["ev"].shape[1] == 2
        for slot in range(2):
            idx = [x for x in b["ev_idx"][slot].tolist() if x >= 0]
            if b["is_first"][slot]:
                n_first += 1
            elif not b["is_reversed"][slot] and last_idx[slot] is not None \
                    and last_idx[slot][0] >= 0:
                # non-first windows continue where the previous left off
                assert idx[0] == last_idx[slot][1] + 1, (idx, last_idx[slot])
            last_idx[slot] = (idx[0], idx[-1]) if idx else (-1, -1)
    assert n_first >= 2  # sequences rotate through slots


def test_stream_loader_always_has_labels(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "train")
    loader = StreamTrainLoader(seqs, cfg, batch_size=2, seed=1)
    it = iter(loader)
    for _ in range(10):
        b = next(it)
        for slot in range(2):
            has = any(b["labels"][t][slot] is not None
                      for t in range(len(b["labels"])))
            assert has, "train stream window without labels"


def test_eval_loader_full_coverage(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "val")
    loader = EvalStreamLoader(seqs, cfg, batch_size=2)
    seen = {}   # seq path -> list of ev_idx
    for b in iter(loader):
        for slot in range(2):
            p = b["paths"][slot]
            if not p:
                continue
            seen.setdefault(p, []).extend(
                x for x in b["ev_idx"][slot].tolist() if x >= 0)
    assert len(seen) == len(seqs)
    for s in seqs:
        idx = seen[s.seq_dir]
        # every repr from the stream start consumed exactly once, in order
        assert idx == sorted(set(idx))
        assert idx[-1] == s.num_ev_repr - 1


def test_mixed_loader(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "train")
    loader = MixedTrainLoader(StreamTrainLoader(seqs, cfg, 2, 0),
                              RandomTrainLoader(seqs, cfg, 2, 0))
    b = next(iter(loader))
    assert b["ev"].shape[1] == 4
    # random rows always reset the RNN
    assert b["is_first"][2] and b["is_first"][3]


def test_harvest_frames(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "train")
    loader = StreamTrainLoader(seqs, cfg, batch_size=2, seed=3)
    b = next(iter(loader))
    h = harvest_frames(b, frames_per_slot=4, max_gt=8, pad_hw=(64, 96))
    assert h["ev"].shape == (5, 2, 64, 96, 20)
    assert h["frame_t"].shape == (2, 4)
    assert h["labels"].shape == (2, 4, 8, 7)
    assert h["num_frames"] >= 1
    # mask rows correspond to non-zero labels
    for slot in range(2):
        for m in range(4):
            if h["frame_mask"][slot, m]:
                assert h["labels"][slot, m].sum() != 0
                t = h["frame_t"][slot, m]
                assert b["labels"][t][slot] is not None


def test_harvest_padding_hw(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "train")
    b = next(iter(StreamTrainLoader(seqs, cfg, 1, 0)))
    h = harvest_frames(b, 2, 8, pad_hw=(96, 128))
    assert h["ev"].shape[2:] == (96, 128, 20)
    # padded region is zero (bottom-right corner padding)
    assert h["ev"][:, :, 64:, :, :].sum() == 0
    assert h["ev"][:, :, :, 96:, :].sum() == 0


def test_eval_loader_sharding_disjoint_cover(dataset):
    cfg = _cfg(dataset)
    seqs = open_split_sequences(cfg, "val")
    assert len(seqs) == 4
    seen = {}
    for shard in range(2):
        loader = EvalStreamLoader(seqs, cfg, batch_size=2,
                                  shard_index=shard, num_shards=2)
        for b in iter(loader):
            for slot in range(2):
                p = b["paths"][slot]
                if p:
                    seen.setdefault(p, set()).add(shard)
    # every sequence appears in exactly one shard; all sequences covered
    assert len(seen) == len(seqs)
    assert all(len(shards) == 1 for shards in seen.values())


def test_dense_pseudo_budget_zero_drops(tmp_path):
    """Training on a fully-dense pseudo dataset (every repr labeled, as
    the pseudo-labeler produces) must drop ZERO labeled frames when using
    the documented budget: default_frames_per_slot(L, use_label_every)
    covers ceil(L/k)+1 kept frames (reference label subsampling:
    modules/detection.py:129-148)."""
    from leod_tpu.train.trainer import default_frames_per_slot

    root = str(tmp_path / "dense")
    generate_dataset(root, num_train=2, num_val=0, num_test=0,
                     num_reprs=40, label_every=1, first_label_repr=0,
                     hw=(64, 96))
    # stamp every label pseudo (t == 0), as the pseudo-labeler writes
    # them (selftrain/filters.py pred2label) — GT frames are never
    # subsampled by use_label_every, pseudo frames are
    import glob
    import os
    for npz in glob.glob(os.path.join(root, "train", "*", "labels_v2",
                                      "labels.npz")):
        data = dict(np.load(npz))
        data["labels"]["t"] = 0
        np.savez(npz, **data)
    cfg = _cfg(root, L=8)
    seqs = open_split_sequences(cfg, "train")
    loader = StreamTrainLoader(seqs, cfg, batch_size=2, seed=0)

    for k in (2, 4):
        M = default_frames_per_slot(cfg.sequence_length, use_label_every=k)
        dropped = total = 0
        for bi, batch in enumerate(iter(loader)):
            if bi >= 12:
                break
            hb = harvest_frames(batch, M, max_gt=8, pad_hw=(64, 96),
                                use_label_every=k)
            dropped += hb["dropped_frames"]
            total += hb["num_frames"]
        assert total > 0
        assert dropped == 0, (k, M, dropped)


def test_weighted_random_sampler(tmp_path):
    """Class-frequency weighting boosts windows containing rare classes
    (reference: dataset_rnd.py:228-264)."""
    import os

    root = str(tmp_path / "wrs")
    generate_dataset(root, num_train=2, num_val=0, num_test=0,
                     num_reprs=40, label_every=4, first_label_repr=11,
                     hw=(64, 96))
    dirs = sorted(os.path.join(root, "train", d)
                  for d in os.listdir(os.path.join(root, "train")))
    # make every label class 0, except ONE frame in dirs[1] -> class 1
    for k, d in enumerate(dirs):
        npz = os.path.join(d, "labels_v2", "labels.npz")
        data = dict(np.load(npz))
        data["labels"]["class_id"] = 0
        if k == 1:
            i0 = data["objframe_idx_2_label_idx"][-1]
            data["labels"]["class_id"][i0:] = 1
        np.savez(npz, **data)

    cfg = dataclasses.replace(_cfg(root, L=5), weighted_sampling=True)
    seqs = open_split_sequences(cfg, "train")
    loader = RandomTrainLoader(seqs, cfg, batch_size=2, seed=0)
    probs = np.diff(loader.cum_probs, prepend=0.0)
    np.testing.assert_allclose(loader.cum_probs[-1], 1.0)
    # class 1 appears in exactly one window -> that sample's weight
    # includes the whole 1/count_1 mass and must dominate
    assert probs.max() > 2 * np.median(probs)
    # weighted draws hit the heavy sample more often than uniform would
    heavy = int(np.argmax(probs))
    hits = sum(int(np.searchsorted(loader.cum_probs, loader.rng.random(),
                                   side="right")) == heavy
               for _ in range(500))
    assert hits / 500 > probs[heavy] / 2
    # and uniform mode has no distribution
    cfg_u = _cfg(root, L=5)
    assert RandomTrainLoader(seqs, cfg_u, 2, seed=0).cum_probs is None


def test_prefetcher_propagates_errors():
    from leod_tpu.data.loader import Prefetcher

    def boom():
        yield 1
        raise RuntimeError("loader crashed")

    it = iter(Prefetcher(boom()))
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="loader crashed"):
        next(it)


def test_local_batch_slice_single_process():
    from leod_tpu.parallel.distributed import local_batch_slice, process_shard
    assert process_shard() == (0, 1)
    assert local_batch_slice(8) == slice(0, 8)
