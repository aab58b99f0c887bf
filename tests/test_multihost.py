"""Multi-host (sharded) evaluation semantics, validated single-process.

The reference shards streaming eval by global rank and pads short shards
with filler samples (reference: data/utils/stream_sharded_datapipe.py:
59-117). Here: running the eval as N independent shards and merging the
evaluator buffers must reproduce the single-shard run exactly — every
labeled frame evaluated exactly once, identical metrics.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from leod_tpu.config import (BackboneConfig, HeadConfig, ModelConfig,
                             TrainingConfig, ExperimentConfig, dataset_preset)
from leod_tpu.data.loader import EvalStreamLoader, open_split_sequences
from leod_tpu.data.synthetic import generate_dataset
from leod_tpu.eval.prophesee import PropheseeEvaluator
from leod_tpu.models.detector import Detector
from leod_tpu.train.trainer import run_streaming_eval


@pytest.fixture(scope="module")
def exp_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_mh")
    generate_dataset(str(root), num_train=1, num_val=4, num_test=0,
                     num_reprs=32, label_every=4, first_label_repr=11,
                     hw=(64, 96))
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=str(root), resolution_hw=(64, 96),
        sequence_length=4)
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    training = TrainingConfig(batch_size_eval=2, max_det_frames=3)
    return ExperimentConfig(dataset=dst, model=model, training=training)


def _buffer_signature(ev: PropheseeEvaluator):
    """Order-independent signature of (labels, predictions) buffers."""
    def sig(frames):
        rows = []
        for f in frames:
            for r in f:
                rows.append((int(r["t"]), round(float(r["x"]), 3),
                             round(float(r["y"]), 3),
                             round(float(r["w"]), 3), int(r["class_id"])))
        return sorted(rows)
    return sig(ev.labels), sig(ev.predictions), len(ev.labels)


def test_sharded_eval_union_equals_full(exp_cfg):
    import jax
    det = Detector(exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    full_ev = PropheseeEvaluator("gen1", False)
    m_full = run_streaming_eval(det, variables, exp_cfg, split="val",
                                frames_per_slot=4, shard_index=0,
                                num_shards=1, evaluator=full_ev)

    n_shards = 3            # 4 sequences over 3 shards -> one short shard
    merged = PropheseeEvaluator("gen1", False)
    shard_metrics = []
    for s in range(n_shards):
        ev = PropheseeEvaluator("gen1", False)
        shard_metrics.append(run_streaming_eval(
            det, variables, exp_cfg, split="val", frames_per_slot=4,
            shard_index=s, num_shards=n_shards, evaluator=ev))
        merged.merge(ev)

    assert _buffer_signature(merged) == _buffer_signature(full_ev)
    m_merged = merged.evaluate()
    for k, v in m_full.items():
        np.testing.assert_allclose(m_merged[k], v, rtol=1e-9,
                                   err_msg=f"metric {k}")


def test_eval_loader_pads_short_shards(exp_cfg):
    seqs = open_split_sequences(exp_cfg.dataset, "val")
    # shard 0 of 4 gets exactly 1 sequence < batch 2: must pad, not crash
    loader = EvalStreamLoader(seqs, exp_cfg.dataset, batch_size=2,
                              shard_index=0, num_shards=4)
    n = 0
    for batch in loader:
        assert batch["ev"].shape[1] == 2
        n += 1
    assert n == len(loader) > 0
    # all shards agree on the common (max) step count for pjit lockstep
    lens = {len(EvalStreamLoader(seqs, exp_cfg.dataset, batch_size=2,
                                 shard_index=s, num_shards=4))
            for s in range(4)}
    assert len(lens) == 1


def test_val_ratio_subsamples_eval_split(exp_cfg):
    """dataset.val_ratio subsamples the eval split every-k
    (reference: dataset_streaming.py:81-83)."""
    import jax
    det = Detector(exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    full = PropheseeEvaluator("gen1", False)
    run_streaming_eval(det, variables, exp_cfg, split="val",
                       frames_per_slot=4, shard_index=0, num_shards=1,
                       evaluator=full)
    half_cfg = dataclasses.replace(
        exp_cfg, dataset=dataclasses.replace(exp_cfg.dataset, val_ratio=0.5))
    half = PropheseeEvaluator("gen1", False)
    run_streaming_eval(det, variables, half_cfg, split="val",
                       frames_per_slot=4, shard_index=0, num_shards=1,
                       evaluator=half)
    assert 0 < len(half.labels) == len(full.labels) // 2


def test_allgather_pack_roundtrip():
    from leod_tpu.parallel.distributed import _pack_buffers, _unpack_into
    from leod_tpu.data.labels import PROPH_DTYPE

    src = PropheseeEvaluator("gen1", False)
    frame = np.zeros((2,), PROPH_DTYPE)
    frame["t"] = (100, 100)
    frame["x"] = (1.5, 2.5)
    src.add_labels([frame])
    src.add_predictions([frame[:1]])

    dst = PropheseeEvaluator("gen1", False)
    _unpack_into(dst, _pack_buffers(src))
    assert len(dst.labels) == 1 and len(dst.predictions) == 1
    np.testing.assert_array_equal(dst.labels[0], frame)
