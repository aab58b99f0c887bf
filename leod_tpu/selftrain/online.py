"""Online SSOD: an EMA teacher on weak views supervises the student on
strong views, within one training loop.

The reference ships this subsystem but never wires it (its
data/utils/ssod_augmentor.py + modules/utils/ssod.py:353-460 are dead
code; models/detection/yolox_extension/models/build.py:10 asserts
`not ssod`). Here it is live: `StreamTrainLoader(ssod=True)` yields
weak/strong paired batches, `OnlineSSODBatcher` (this file) runs the
teacher on the weak view inside the prefetch thread and emits ordinary
train batches in the strong view with pseudo+GT merged labels, and
`Trainer.fit` EMA-updates the teacher after every optimizer step
(reference EMA semantics incl. the true-average warm-up:
modules/utils/ssod.py:429-460).

TPU-first notes: teacher inference reuses the fixed-shape jitted
eval_step + NMS postprocess (one extra compiled program, dispatched
from the prefetch thread so it overlaps the student's step); the EMA
update is one fused jitted tree-map with the teacher buffer donated.
The teacher copy is kept in float32 so a bf16 student's slow EMA decay
(1 - alpha = 1e-3) is not rounded away.
"""
from __future__ import annotations

import threading
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig, stem_fold_hw
from ..data.augment import weak_to_strong_boxes
from ..data.loader import harvest_frames
from ..models.detector import Detector
from ..ops.nms import postprocess
from ..train.step import cached_eval_step
from .filters import pred_to_label


def _local_replica(tree):
    """Replace leaves sharded/replicated across >1 device with a
    zero-copy single-device view (addressable_data(0)). Identity for
    plain single-device arrays and numpy leaves."""
    def f(x):
        if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1:
            return x.addressable_data(0)
        return x
    return jax.tree_util.tree_map(f, tree)


def make_teacher_update(method: str = "ema", alpha: float = 0.999):
    """-> update(teacher_vars, student_vars, step) -> teacher_vars.

    'ema': exponential moving average with the SoftTeacher/3DIoUMatch
    true-average warm-up alpha_t = min(1 - 1/(step+1), alpha).
    'every-N': hard copy of the student every N steps.
    (reference: modules/utils/ssod.py:429-460)
    """
    method = method.lower()
    if method == "ema":
        # the old teacher tree is dead the moment the new one exists:
        # donate it so the f32 teacher never transiently doubles in HBM
        @partial(jax.jit, donate_argnums=(0,))
        def update(teacher, student, step):
            a = jnp.minimum(1.0 - 1.0 / (step + 1.0), alpha)
            return jax.tree_util.tree_map(
                lambda t, s: a * t + (1.0 - a) * s.astype(jnp.float32),
                teacher, student)
        return update
    if method.startswith("every-"):
        n = int(method.split("-")[-1])

        def update(teacher, student, step):
            if (int(step) + 1) % n == 0:
                return jax.tree_util.tree_map(
                    lambda s: s.astype(jnp.float32), student)
            return teacher
        return update
    raise ValueError(f"unknown teacher update method: {method}")


class OnlineSSODBatcher:
    """Wraps an ssod=True stream loader into a plain train-batch source.

    For each paired batch: run the (frozen-this-step) EMA teacher over
    the weak view at every timestep, threshold-filter the detections
    into pseudo boxes, map them into the strong view's coordinate space
    (augment.weak_to_strong_boxes), merge with the strong view's GT
    (GT wins on its frames), and yield the strong batch. The output has
    exactly the collate() schema, so the trainer's harvest/device path
    is unchanged.

    Teacher LSTM state tracks the weak stream continuously from step 0
    (slots are infinite streams — skipping inference during burn-in
    would leave the teacher cold at the handover), but pseudo labels
    only merge once `burn_in_steps` batches have been consumed.
    """

    def __init__(self, loader, det: Detector, variables,
                 cfg: ExperimentConfig, batch_size: int,
                 start_step: int = 0):
        oc = cfg.training.ssod_online
        self.loader = loader
        self.det = det
        self.cfg = cfg
        self.oc = oc
        # Under a mesh (single-host OR multi-host) the student variables
        # live replicated across devices; the teacher must run on ONE
        # local device so its det/valid outputs are host-fetchable from
        # the prefetch thread and never mix device sets with the
        # single-device teacher state table. Replicated leaves hold a
        # full copy on every device, so addressable_data(0) is a
        # zero-copy single-device view — no host/tunnel roundtrip.
        variables = _local_replica(variables)
        # copy=True: with an f32 student, asarray would alias the live
        # student buffers, which the train step donates (deleting the
        # teacher's leaves with them)
        self.teacher_vars = jax.tree_util.tree_map(
            lambda x: jnp.array(x, jnp.float32, copy=True), variables)
        self._eval_step = cached_eval_step(det)
        self._update = make_teacher_update(oc.update_method, oc.alpha)
        self.states = det.init_states(batch_size)
        self.lens = np.zeros(batch_size, np.int64)
        # burn-in is counted in batches == optimizer steps; seed from the
        # restored step so a resumed run does not re-impose the full
        # GT-only burn-in after every preemption
        self.batches_out = int(start_step)
        # teacher inference runs in the prefetch thread, the EMA update
        # in the fit loop; the update DONATES the old teacher tree, so
        # the read->dispatch handoff must not interleave with the
        # donation (a deleted-buffer crash).  Both critical sections are
        # async jit dispatches — the lock is held for microseconds.
        self._teacher_lock = threading.Lock()

    # -- teacher maintenance (called by the fit loop after each step) ----
    def update_teacher(self, student_variables, step: int):
        # mesh-replicated student -> one local device replica, so the
        # EMA jit never mixes device sets. addressable_data(0) stays ON
        # DEVICE — an np.asarray here would drag the full model
        # host-side through the tunnel every optimizer step
        student_variables = _local_replica(student_variables)
        with self._teacher_lock:
            self.teacher_vars = self._update(self.teacher_vars,
                                             student_variables, step)

    # -- batch production ------------------------------------------------
    def _teacher_dets(self, weak: Dict[str, Any]):
        cfg = self.cfg
        L, B = weak["ev"].shape[:2]
        hb = harvest_frames(
            {**weak, "labels": [[None] * B for _ in range(L)]},
            frames_per_slot=L, max_gt=1,
            pad_hw=cfg.model.backbone.in_res_hw,
            fold_hw=stem_fold_hw(cfg.model))
        hb["frame_t"] = np.tile(np.arange(L, dtype=np.int32), (B, 1))
        hb["frame_mask"] = np.ones_like(hb["frame_t"], bool)
        dev = {k: hb[k] for k in ("ev", "is_first", "frame_t",
                                  "frame_mask", "labels")}
        with self._teacher_lock:
            self.states, preds = self._eval_step(self.teacher_vars,
                                                 self.states, dev)
        pp = cfg.model.postprocess
        dets, valid = postprocess(preds,
                                  num_classes=cfg.model.head.num_classes,
                                  conf_threshold=pp.confidence_threshold,
                                  nms_threshold=pp.nms_threshold,
                                  pre_topk=pp.pre_nms_topk,
                                  max_dets=pp.max_dets)
        return np.asarray(dets), np.asarray(valid)

    def _merge(self, pair: Dict[str, Any], dets, valid) -> Dict[str, Any]:
        cfg, oc = self.cfg, self.oc
        weak, strong = pair["weak"], pair["strong"]
        dst = cfg.dataset
        hw = dst.loading_hw
        L, B = weak["ev"].shape[:2]
        labels: List[List[Optional[Any]]] = [list(row)
                                             for row in strong["labels"]]
        for b in range(B):
            for t in range(L):
                if strong["is_padded"][b, t]:
                    continue
                if labels[t][b] is not None and oc.use_gt:
                    continue                      # GT wins on its frames
                if self.lens[b] + t < oc.skip_first_t:
                    continue                      # cold RNN after reset
                d = dets[b * L + t][valid[b * L + t]]
                pseudo = pred_to_label(
                    d if len(d) else None, hw,
                    obj_thresh=oc.obj_thresh, cls_thresh=oc.cls_thresh,
                    dataset=dst.name,
                    downsampled_by_2=dst.downsample_by_factor_2)
                if len(pseudo) == 0:
                    continue
                mapped = weak_to_strong_boxes(pseudo,
                                              pair["weak_params"][b],
                                              pair["strong_applied"][b])
                labels[t][b] = mapped if len(mapped) else None
        out = dict(strong)
        out["labels"] = labels
        return out

    def __iter__(self):
        for pair in self.loader:
            weak = pair["weak"]
            self.lens[np.asarray(weak["is_first"], bool)] = 0
            dets, valid = self._teacher_dets(weak)
            if self.batches_out >= self.oc.burn_in_steps:
                batch = self._merge(pair, dets, valid)
            else:
                batch = pair["strong"]
            self.lens += weak["ev"].shape[0]
            self.batches_out += 1
            yield batch
