"""Test-time-augmentation evaluation (reference: modules/utils/tta.py).

Runs up to four views over each sequence — normal, h-flip (in-batch),
t-flip (reversed streaming pass), t-flip+h-flip — keeps predictions only
at GT-labeled frames, re-aligns flipped views (h-flip-back; t-flip index
offset), merges each frame's pooled predictions by NMS, then evaluates
with the Prophesee COCO protocol.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from ..config import ExperimentConfig, PostprocessConfig, stem_fold_hw
from ..data.labels import Boxes
from ..data.loader import (EvalStreamLoader, Prefetcher, harvest_frames,
                           open_split_sequences)
from ..models.detector import Detector
from ..ops.nms import batched_nms_numpy, postprocess
from ..train.step import cached_eval_step
from .prophesee import PropheseeEvaluator, boxes_to_prophesee


def merge_view_preds(pred_rows: np.ndarray, pp: PostprocessConfig
                     ) -> np.ndarray:
    """NMS-merge pooled (x1,y1,x2,y2,obj,cls_conf,cls_id) rows from
    multiple TTA views (reference: tta.py:18-61)."""
    if len(pred_rows) == 0:
        return pred_rows
    score = pred_rows[:, 4] * pred_rows[:, 5]
    keep = score >= pp.confidence_threshold
    rows = pred_rows[keep]
    if len(rows) == 0:
        return rows
    kept = batched_nms_numpy(rows[:, :4], rows[:, 4] * rows[:, 5],
                             rows[:, 6], pp.nms_threshold)
    return rows[kept]


class _SeqResult:
    """Per-sequence accumulation (reference: EventSeqResult, tta.py:64-197)."""

    def __init__(self, img_w: float):
        self.img_w = img_w
        self.preds: Dict[int, List[np.ndarray]] = {}
        self.gts: Dict[int, Boxes] = {}
        self.ended = False
        self.augmented = False

    def add(self, ev_idx: int, gt: Optional[Boxes], pred: np.ndarray,
            is_hflip: bool, is_tflip: bool, tflip_offset: int):
        if is_hflip or is_tflip:
            self.augmented = True
        if is_hflip and len(pred):
            pred = pred.copy()
            w = pred[:, 2] - pred[:, 0]
            pred[:, 0] = self.img_w - 1 - pred[:, 0] - w
            pred[:, 2] = pred[:, 0] + w
        if is_tflip:
            ev_idx = ev_idx + tflip_offset
        self.preds.setdefault(ev_idx, []).append(pred)
        if gt is not None and not is_hflip and not is_tflip:
            assert ev_idx not in self.gts
            self.gts[ev_idx] = gt


def run_tta_eval(det: Detector, variables, cfg: ExperimentConfig,
                 split: str = "test", hflip: bool = True, tflip: bool = True,
                 batch_size: Optional[int] = None,
                 conf_threshold: Optional[float] = None,
                 frames_per_slot: Optional[int] = None,
                 shard_index: Optional[int] = None,
                 num_shards: Optional[int] = None,
                 evaluator: Optional[PropheseeEvaluator] = None
                 ) -> Optional[Dict[str, float]]:
    """shard_index/num_shards: deterministic sequence sharding (same
    pyramid deal as run_streaming_eval); pass one `evaluator` per shard
    and PropheseeEvaluator.merge the buffers before evaluating — the
    union of shards equals a full run (tests/test_selftrain_shard.py);
    with an external evaluator the return value is None (the caller
    evaluates the merged buffers once).
    The t-flip pass reuses the identical deal, so each shard sees both
    views of exactly its own sequences. Defaults: under multi-process
    each process evaluates its own shard and the buffers are
    all-gathered before the COCO eval, exactly like run_streaming_eval."""
    from ..parallel.distributed import allgather_evaluator, process_shard

    if shard_index is None and num_shards is None:
        shard_index, num_shards = process_shard()
        sync_metrics = True
    else:
        shard_index, num_shards = shard_index or 0, num_shards or 1
        sync_metrics = False
        if num_shards > 1 and evaluator is None:
            # a per-shard AP is statistically meaningless — the caller
            # must collect one evaluator per shard and merge before
            # evaluating (see docstring); returning it silently would
            # masquerade as the split's metric
            raise ValueError(
                "explicit sharding needs an external `evaluator` "
                "(merge the shards' buffers, then evaluate once)")
    if jax.process_count() > 1:
        # postprocess results are read back with numpy per shard, so the
        # weights must be host-local — but re-feed them to jit as a
        # DEVICE tree (a numpy tree would re-upload the full model every
        # batch through the tunnel)
        variables = jax.device_put(jax.tree.map(np.asarray, variables))
    dst = cfg.dataset
    pp = cfg.model.postprocess
    if conf_threshold is not None:
        import dataclasses
        pp = dataclasses.replace(pp, confidence_threshold=conf_threshold)
    from ..train.trainer import default_frames_per_slot
    B = batch_size or cfg.training.batch_size_eval
    n_cls = cfg.model.head.num_classes
    L = dst.sequence_length
    M = frames_per_slot or default_frames_per_slot(L)
    eval_step = cached_eval_step(det)
    results: Dict[str, _SeqResult] = {}

    passes = [False] + ([True] if tflip else [])
    for time_flip in passes:
        seqs = open_split_sequences(
            dst, split, seq_ratio={"val": dst.val_ratio,
                                   "test": dst.test_ratio}.get(split, -1.0))
        B_eff = min(B, len(seqs))
        loader = EvalStreamLoader(seqs, dst, B_eff, time_flip=time_flip,
                                  shard_index=shard_index,
                                  num_shards=num_shards)
        B_dev = B_eff * 2 if hflip else B_eff
        states = det.init_states(B_dev)
        with Prefetcher(iter(loader)) as prefetcher:
            # closed on exceptions too: an abandoned producer thread
            # dying mid device-dispatch aborts the process (loader.py)
            for batch in prefetcher:
                ev = batch["ev"]
                if hflip:
                    dev_in = dict(batch)
                    dev_in["ev"] = np.concatenate([ev, ev[..., ::-1]], axis=1)
                    dev_in["is_first"] = np.concatenate([batch["is_first"]] * 2)
                    dev_in["labels"] = [row * 2 for row in batch["labels"]]
                else:
                    dev_in = batch
                while True:
                    hb = harvest_frames(dev_in, M, cfg.model.head.max_gt,
                                        cfg.model.backbone.in_res_hw,
                                        fold_hw=stem_fold_hw(cfg.model))
                    if not hb["dropped_frames"]:
                        break
                    # eval must never drop labeled frames (same auto-regrow
                    # as run_streaming_eval)
                    M = int(hb["max_slot_frames"])
                    print(f"tta harvest budget grown to {M}/slot "
                          f"(recompiling eval step)", flush=True)
                dev = {k: hb[k] for k in ("ev", "is_first", "frame_t",
                                          "frame_mask", "labels")}
                states, preds = eval_step(variables, states, dev)
                if not time_flip:
                    # end-of-stream bookkeeping must run even for steps
                    # with ZERO harvested frames: a sequence whose final
                    # window keeps no labels still ends here, and the
                    # `assert rec.ended` below depends on seeing it
                    for b in range(B_eff):
                        p = batch["paths"][b]
                        if p and bool(batch["is_last"][b]):
                            results.setdefault(
                                p, _SeqResult(dst.loading_hw[1])).ended = True
                if hb["num_frames"] == 0:
                    continue
                dets, valid = postprocess(preds, num_classes=n_cls,
                                          conf_threshold=pp.confidence_threshold,
                                          nms_threshold=pp.nms_threshold,
                                          pre_topk=pp.pre_nms_topk,
                                          max_dets=pp.max_dets)
                dets, valid = np.asarray(dets), np.asarray(valid)
                for brow in range(len(hb["boxes"])):
                    b = brow % B_eff
                    is_h = brow >= B_eff
                    path = batch["paths"][b]
                    if not path:
                        continue
                    rec = results.setdefault(path, _SeqResult(dst.loading_hw[1]))
                    for m in range(M):
                        gt = hb["boxes"][brow][m]
                        if gt is None:
                            continue
                        t = int(hb["frame_t"][brow, m])
                        ev_i = int(batch["ev_idx"][b, t])
                        if ev_i < 0:
                            continue
                        row = brow * M + m
                        d = dets[row][valid[row]]
                        rec.add(ev_i, gt if not is_h else None, d,
                                is_hflip=is_h, is_tflip=time_flip,
                                tflip_offset=dst.tflip_offset)
        for s in seqs:
            s.close()

    external = evaluator is not None
    if not external:
        evaluator = PropheseeEvaluator(dst.name, dst.downsample_by_factor_2)
    for path, rec in results.items():
        # a truncated normal pass must fail loudly, not silently evaluate
        # a partial sequence (the pseudo runner makes the same assertion;
        # reference: predict.py:219 asserts end-of-stream before saving)
        assert rec.ended, f"{path} never reached end-of-stream"
        for ev_i in sorted(rec.gts.keys()):
            pooled = np.concatenate(
                [p for p in rec.preds.get(ev_i, []) if len(p)] or
                [np.zeros((0, 7), np.float32)])
            merged = merge_view_preds(pooled, pp) if rec.augmented else pooled
            gt_p, dt_p = boxes_to_prophesee(rec.gts[ev_i],
                                            merged if len(merged) else None)
            evaluator.add_labels([gt_p])
            evaluator.add_predictions([dt_p])
    if sync_metrics:
        allgather_evaluator(evaluator)
    if external:
        # the caller merges shard evaluators and evaluates ONCE; a
        # per-shard evaluate() would be both wasted work and a
        # statistically meaningless partial metric
        return None
    return evaluator.evaluate()
