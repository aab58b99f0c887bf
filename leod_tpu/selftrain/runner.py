"""Pseudo-label generation driver.

Streams the training split through the teacher (optionally with h-flip
TTA in-batch and a second time-flipped pass), converts filtered
predictions to pseudo labels, evaluates them against withheld GT, and
writes the new dataset (reference: modules/pseudo_labeler.py:410-797 +
predict.py:118-278).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..config import ExperimentConfig, stem_fold_hw
from ..data.loader import (EvalStreamLoader, Prefetcher, harvest_frames,
                           open_split_sequences)
from ..eval.prophesee import PropheseeEvaluator, boxes_to_prophesee
from ..models.detector import Detector
from ..ops.nms import postprocess
from ..train.step import cached_eval_step
from .filters import evaluate_pseudo_labels, pred_to_label
from .pseudo_labeler import PseudoLabelConfig, SequenceRecorder


class _SlotLens:
    """Per-slot processed-frame counters (reference: SeqLens,
    modules/utils/detection.py:160-193)."""

    def __init__(self, n: int):
        self.lens = np.zeros(n, np.int64)

    def reset(self, is_first: np.ndarray):
        self.lens[is_first] = 0

    def add(self, l: int):
        self.lens += l


class PseudoLabelRunner:
    def __init__(self, det: Detector, variables, cfg: ExperimentConfig,
                 pl_cfg: PseudoLabelConfig, save_dir: str,
                 batch_size: Optional[int] = None,
                 shard_index: int = 0, num_shards: int = 1):
        """shard_index/num_shards: deterministic sequence sharding (the
        same pyramid deal as sharded eval) so pseudo-generation — the
        reference's 7-10h single-GPU bottleneck (predict.py:167-168) —
        parallelizes over processes: each shard records and saves only
        its own sequences, and the union of shards equals a full run
        (tests/test_selftrain_shard.py)."""
        self.det = det
        self.variables = variables
        self.cfg = cfg
        self.pl = pl_cfg
        self.save_dir = save_dir
        self.shard_index, self.num_shards = shard_index, num_shards
        self.batch_size = batch_size or cfg.training.batch_size_eval
        self.recorders: Dict[str, SequenceRecorder] = {}
        self.quality = PropheseeEvaluator(cfg.dataset.name,
                                          cfg.dataset.downsample_by_factor_2)
        self.pr_metrics: List[Dict[str, float]] = []
        self._gt_pairs: Tuple[List, List] = ([], [])

    # -- one streaming pass ---------------------------------------------------
    def _run_pass(self, time_flip: bool):
        cfg, dst, pl = self.cfg, self.cfg.dataset, self.pl
        seqs = open_split_sequences(dst, "train", seq_ratio=dst.train_ratio,
                                    label_ratio=dst.ratio, pseudo_mode=True)
        B = min(self.batch_size, len(seqs))
        loader = EvalStreamLoader(seqs, dst, B, time_flip=time_flip,
                                  start_from_zero=True,
                                  shard_index=self.shard_index,
                                  num_shards=self.num_shards)
        L = dst.sequence_length
        hflip = pl.tta_hflip
        B_dev = B * 2 if hflip else B
        eval_step = cached_eval_step(self.det)
        states = self.det.init_states(B_dev)
        lens = _SlotLens(B)
        pp = cfg.model.postprocess
        n_cls = cfg.model.head.num_classes
        hw = dst.loading_hw

        with Prefetcher(iter(loader)) as prefetcher:
            # closed on exceptions too: an abandoned producer thread
            # dying mid device-dispatch aborts the process (loader.py)
            for batch in prefetcher:
                lens.reset(batch["is_first"])
                if hflip:
                    dev_in = dict(batch)
                    dev_in["ev"] = np.concatenate(
                        [batch["ev"], batch["ev"][..., ::-1]], axis=1)
                    dev_in["is_first"] = np.concatenate([batch["is_first"]] * 2)
                    dev_in["labels"] = [row * 2 for row in batch["labels"]]
                    dev_in["is_padded"] = np.concatenate(
                        [batch["is_padded"]] * 2)
                else:
                    dev_in = batch
                hb = harvest_frames(
                    {**dev_in, "labels": [[None] * dev_in["ev"].shape[1]
                                          for _ in range(L)]},
                    frames_per_slot=L, max_gt=1,
                    pad_hw=cfg.model.backbone.in_res_hw,
                    fold_hw=stem_fold_hw(cfg.model))
                # predict on ALL timesteps; host decides what to keep
                hb["frame_t"] = np.tile(np.arange(L, dtype=np.int32),
                                        (dev_in["ev"].shape[1], 1))
                hb["frame_mask"] = np.ones_like(hb["frame_t"], bool)
                dev = {k: hb[k] for k in ("ev", "is_first", "frame_t",
                                          "frame_mask", "labels")}
                states, preds = eval_step(self.variables, states, dev)
                dets, valid = postprocess(preds, num_classes=n_cls,
                                          conf_threshold=pp.confidence_threshold,
                                          nms_threshold=pp.nms_threshold,
                                          pre_topk=pp.pre_nms_topk,
                                          max_dets=pp.max_dets)
                dets, valid = np.asarray(dets), np.asarray(valid)
                self._consume(batch, dets, valid, L, B, hflip, time_flip, hw,
                              lens.lens.copy())
                lens.add(L)
        for s in seqs:
            s.close()

    def _consume(self, batch, dets, valid, L, B, hflip, time_flip, hw,
                 lens_before):
        """Route per-frame detections into recorders + quality eval."""
        cfg, pl = self.cfg, self.pl
        dst = cfg.dataset
        views = [(0, False)] + ([(B, True)] if hflip else [])
        for b in range(B):
            path = batch["paths"][b]
            if not path:
                continue
            if path not in self.recorders:
                self.recorders[path] = SequenceRecorder(
                    path, 2.0 if dst.downsample_by_factor_2 else 1.0,
                    pl, cfg.model.postprocess)
            rec = self.recorders[path]
            for off, is_h in views:
                row_labels: List[Optional] = [None] * L
                for t in range(L):
                    if batch["is_padded"][b, t] or batch["ev_idx"][b, t] < 0:
                        continue
                    gt = batch["labels"][t][b]
                    skipped_gt = batch["skipped"][t][b]
                    if gt is not None and pl.use_gt:
                        # keep the GT on its frame (recorded once)
                        if not is_h and not time_flip:
                            row_labels[t] = gt
                        continue
                    # skip predicting on frames too soon after a state
                    # reset: not enough history for reliable predictions
                    # (reference: pseudo_labeler.py:525-531)
                    if lens_before[b] + t < pl.skip_first_t:
                        continue
                    row = (b + off) * L + t
                    d = dets[row][valid[row]]
                    pseudo = pred_to_label(
                        d if len(d) else None, hw,
                        obj_thresh=pl.obj_thresh, cls_thresh=pl.cls_thresh,
                        dataset=dst.name,
                        downsampled_by_2=dst.downsample_by_factor_2)
                    row_labels[t] = pseudo if len(pseudo) else None
                    if skipped_gt is not None and not is_h and not time_flip:
                        self._gt_pairs[0].append(skipped_gt)
                        self._gt_pairs[1].append(pseudo)
                        pred_arr = (np.concatenate(
                            [pseudo.xyxy(), pseudo.objectness[:, None],
                             pseudo.class_confidence[:, None],
                             pseudo.class_id[:, None]], -1)
                            if len(pseudo) else None)
                        gt_p, dt_p = boxes_to_prophesee(skipped_gt, pred_arr)
                        self.quality.add_labels([gt_p])
                        self.quality.add_predictions([dt_p])
                rec.update(row_labels, batch["ev_idx"][b].tolist(),
                           bool(batch["is_last"][b]),
                           batch["is_padded"][b].tolist(),
                           is_hflip=is_h, is_tflip=time_flip,
                           tflip_offset=dst.tflip_offset)

    # -- full run ---------------------------------------------------------------
    def run(self) -> Dict[str, float]:
        train_dir = os.path.join(self.save_dir, "train")
        if self.num_shards == 1:
            assert not os.path.exists(train_dir), \
                f"{train_dir} already exists"
        elif os.path.isdir(train_dir):
            # shards share save_dir, so the dir may legitimately hold the
            # OTHER shards' output — but never sequences outside this
            # run's deterministic deal (a stale previous run would
            # silently mix teachers). Per-sequence collisions within the
            # deal still fail fast in SequenceRecorder.save (mkdir
            # exist_ok=False).
            from ..data.sequence import list_sequence_dirs
            expected = {os.path.basename(d.rstrip("/"))
                        for d in list_sequence_dirs(
                            self.cfg.dataset.path, "train")}
            stale = set(os.listdir(train_dir)) - expected
            assert not stale, (
                f"{train_dir} contains sequences from a previous run: "
                f"{sorted(stale)[:5]}")
        os.makedirs(train_dir, exist_ok=True)
        self._run_pass(time_flip=False)
        if self.pl.tta_tflip:
            self._run_pass(time_flip=True)
        # quality metrics vs withheld GT
        metrics: Dict[str, float] = {}
        if self._gt_pairs[0]:
            classes = self.cfg.dataset.classes
            metrics.update(evaluate_pseudo_labels(
                self._gt_pairs[0], self._gt_pairs[1],
                [True] * len(self._gt_pairs[0]),
                self.cfg.model.head.num_classes, classes, prefix="ssod/"))
            coco = self.quality.evaluate()
            if coco:
                metrics.update({f"ssod/teacher_{k}": v
                                for k, v in coco.items()})
        # save every sequence
        for path, rec in self.recorders.items():
            assert rec.ended, f"{path} never reached end-of-stream"
            rec.save(self.save_dir, self.cfg.dataset)
        return metrics
