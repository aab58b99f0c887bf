"""TTA evaluation: view merging + end-to-end on a tiny model (CPU)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from leod_tpu.config import (BackboneConfig, ExperimentConfig, HeadConfig,
                             ModelConfig, PostprocessConfig, TrainingConfig,
                             dataset_preset)
from leod_tpu.data.synthetic import generate_dataset
from leod_tpu.eval.tta import _SeqResult, merge_view_preds, run_tta_eval
from leod_tpu.models.detector import Detector


def test_merge_view_preds():
    pp = PostprocessConfig(confidence_threshold=0.5, nms_threshold=0.45)
    rows = np.array([
        # x1, y1, x2, y2, obj, cls_conf, cls_id
        [10, 10, 50, 50, 0.9, 0.9, 0],
        [11, 11, 51, 51, 0.8, 0.8, 0],    # duplicate from another view
        [100, 100, 140, 140, 0.9, 0.9, 1],
        [200, 200, 240, 240, 0.3, 0.9, 0],  # below conf 0.5 -> dropped
    ], np.float32)
    out = merge_view_preds(rows, pp)
    assert len(out) == 2


def test_seq_result_realignment():
    rec = _SeqResult(img_w=304)
    pred = np.array([[10, 10, 50, 50, 0.9, 0.9, 0]], np.float32)
    # hflip view: box flips back around W-1
    rec.add(5, None, pred.copy(), is_hflip=True, is_tflip=False,
            tflip_offset=-1)
    got = rec.preds[5][0]
    assert got[0, 0] == 304 - 1 - 50 and got[0, 2] == 304 - 1 - 10
    # tflip view: index shifts by the offset
    rec.add(5, None, pred.copy(), is_hflip=False, is_tflip=True,
            tflip_offset=-1)
    assert 4 in rec.preds
    assert rec.augmented


@pytest.mark.slow
def test_run_tta_eval_end_to_end(tmp_path):
    root = str(tmp_path / "synth")
    generate_dataset(root, num_train=0, num_val=2, num_test=0,
                     num_reprs=24, label_every=4, first_label_repr=11,
                     hw=(64, 96))
    dst = dataclasses.replace(dataset_preset("gen1"), path=root,
                              resolution_hw=(64, 96), sequence_length=4)
    cfg = ExperimentConfig(
        dataset=dst,
        model=ModelConfig(backbone=BackboneConfig(embed_dim=32,
                                                  in_res_hw=(64, 96),
                                                  partition_size=(2, 3)),
                          head=HeadConfig(num_classes=2, max_gt=8)),
        training=TrainingConfig(batch_size_eval=2))
    det = Detector(cfg.model, dtype=jnp.float32)
    import jax
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    m = run_tta_eval(det, variables, cfg, split="val", hflip=True,
                     tflip=True, frames_per_slot=4, conf_threshold=0.3)
    assert m is not None and np.isfinite(m["AP"])
