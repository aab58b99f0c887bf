"""Shard-union equality for the expensive offline passes.

Pseudo-label generation is the reference's 7-10h single-GPU bottleneck
(reference: docs/benchmark.md:83-89, predict.py:167-168 single-GPU
assert); here both PseudoLabelRunner and run_tta_eval accept
shard_index/num_shards sequence sharding (the same deterministic
pyramid deal as sharded eval). These tests prove the union of shards
equals a full single-process run — file-identical pseudo datasets and
bit-identical TTA metrics.
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leod_tpu.config import (BackboneConfig, ExperimentConfig, HeadConfig,
                             ModelConfig, PostprocessConfig, TrainingConfig,
                             dataset_preset)
from leod_tpu.data.synthetic import generate_dataset
from leod_tpu.models.detector import Detector
from leod_tpu.selftrain.pseudo_labeler import PseudoLabelConfig
from leod_tpu.selftrain.runner import PseudoLabelRunner


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_shard"))
    generate_dataset(root, num_train=5, num_val=4, num_test=0,
                     num_reprs=24, label_every=4, first_label_repr=3,
                     hw=(64, 96))
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=root, resolution_hw=(64, 96),
        sequence_length=4)
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8),
        # low threshold so a random-init model produces detections and
        # the tracker/NMS actually do work in both runs
        postprocess=PostprocessConfig(confidence_threshold=0.005,
                                      max_dets=16, pre_nms_topk=128))
    cfg = ExperimentConfig(
        dataset=dst, model=model,
        training=TrainingConfig(batch_size_eval=2),
        save_dir=root, exp_name="shard")
    det = Detector(cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(3), batch_size=1)
    return cfg, det, variables


def _pl_cfg():
    return PseudoLabelConfig(obj_thresh=(0.01, 0.01), cls_thresh=(0.01, 0.01),
                             min_track_len=2, tta_hflip=True)


def _seq_labels(save_dir):
    """{seq_name: (labels, f2l, f2r)} of a generated pseudo dataset."""
    from leod_tpu.data.sequence import list_sequence_dirs
    out = {}
    for d in list_sequence_dirs(save_dir, "train"):
        labels = np.load(os.path.join(d, "labels_v2", "labels.npz"))
        f2r = np.load(os.path.join(
            d, "event_representations_v2",
            os.listdir(os.path.join(d, "event_representations_v2"))[0],
            "objframe_idx_2_repr_idx.npy"))
        out[os.path.basename(d)] = (labels["labels"],
                                    labels["objframe_idx_2_label_idx"], f2r)
    return out


def test_pseudo_runner_shard_union(setup, tmp_path):
    cfg, det, variables = setup
    full_dir = str(tmp_path / "full")
    PseudoLabelRunner(det, variables, cfg, _pl_cfg(), full_dir).run()

    shard_dir = str(tmp_path / "sharded")
    for si in range(2):
        PseudoLabelRunner(det, variables, cfg, _pl_cfg(), shard_dir,
                          shard_index=si, num_shards=2).run()

    full = _seq_labels(full_dir)
    sharded = _seq_labels(shard_dir)
    assert set(full) == set(sharded) and len(full) == 5
    for name in full:
        fl, ff2l, ff2r = full[name]
        sl, sf2l, sf2r = sharded[name]
        assert len(fl) > 0
        np.testing.assert_array_equal(fl, sl, err_msg=name)
        np.testing.assert_array_equal(ff2l, sf2l, err_msg=name)
        np.testing.assert_array_equal(ff2r, sf2r, err_msg=name)
    # val split symlinked at the root by both runs
    assert os.path.isdir(os.path.join(shard_dir, "val"))


def test_tta_eval_shard_union(setup):
    cfg, det, variables = setup
    from leod_tpu.eval.prophesee import PropheseeEvaluator
    from leod_tpu.eval.tta import run_tta_eval

    full = run_tta_eval(det, variables, cfg, split="val", hflip=True,
                        tflip=True, batch_size=2)
    evs = []
    for si in range(2):
        ev = PropheseeEvaluator(cfg.dataset.name,
                                cfg.dataset.downsample_by_factor_2)
        m = run_tta_eval(det, variables, cfg, split="val", hflip=True,
                         tflip=True, batch_size=2,
                         shard_index=si, num_shards=2, evaluator=ev)
        assert m is None              # external evaluator: caller merges
        assert ev.has_data()          # each shard got >= 1 sequence
        evs.append(ev)
    merged = evs[0].merge(evs[1]).evaluate()
    assert full is not None and merged is not None
    for k in full:
        assert merged[k] == pytest.approx(full[k], abs=1e-12), k
