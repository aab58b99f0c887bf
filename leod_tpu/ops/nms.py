"""Fixed-shape NMS and YOLOX postprocessing (jittable, TPU-friendly).

Replaces torchvision's CUDA `nms`/`batched_nms` used at every reference
postprocess site (reference: models/detection/yolox/utils/boxes.py:32-86)
with a static-shape greedy suppression:

  1. score-sort the top-K candidates (K static),
  2. O(K^2) IoU matrix once,
  3. sequential sweep (lax.fori_loop) masking suppressed boxes.

Per-class semantics use the coordinate-offset trick (shift each class to
a disjoint coordinate range), which is exactly equivalent to per-class
NMS for finite canvases.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import cxcywh_to_xyxy, pairwise_iou

_CLASS_OFFSET = 1.0e5  # larger than any canvas coordinate


def nms_mask(boxes_xyxy: jnp.ndarray, iou_threshold: float,
             valid: jnp.ndarray,
             class_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-DESCENDING-sorted inputs.

    boxes_xyxy [K,4] (rows MUST already be score-sorted desc — the sort
    order is a precondition, which is why there is no scores argument),
    valid [K] bool. class_ids [K] restricts suppression to same-class
    pairs EXACTLY — unlike the float32 coordinate-offset trick, which
    quantizes coordinates (~1 px spacing near cls_id*1e5 for ids ~100)
    and can flip keep/suppress decisions at the threshold. Returns
    keep [K] bool.
    """
    k = boxes_xyxy.shape[0]
    iou = pairwise_iou(boxes_xyxy, boxes_xyxy)           # [K, K]
    suppress_pair = iou > iou_threshold
    if class_ids is not None:
        suppress_pair &= class_ids[None, :] == class_ids[:, None]
    idx = jnp.arange(k)
    later = idx[None, :] > idx[:, None]                  # j strictly after i

    def body(i, keep):
        row = suppress_pair[i] & later[i] & keep[i]
        return keep & ~row

    return jax.lax.fori_loop(0, k, body, valid)


@functools.partial(jax.jit, static_argnames=("num_classes", "pre_topk",
                                             "max_dets", "class_agnostic",
                                             "use_pallas"))
def postprocess(predictions: jnp.ndarray, num_classes: int,
                conf_threshold: float = 0.1, nms_threshold: float = 0.45,
                pre_topk: int = 1000, max_dets: int = 300,
                class_agnostic: bool = False, use_pallas: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """YOLOX postprocess with fixed output shapes.

    predictions: [B, A, 4 + 1 + num_classes] with (cx, cy, w, h) absolute,
    obj prob, class probs (already sigmoided, as the reference head emits).

    Returns:
      dets  [B, max_dets, 7] = (x0, y0, x1, y1, obj_conf, cls_conf, cls_id)
      valid [B, max_dets] bool
    (reference contract: yolox/utils/boxes.py:32-86 returns ragged lists;
    callers here strip padding on host.)
    """
    boxes = cxcywh_to_xyxy(predictions[..., :4])          # [B, A, 4]
    obj = predictions[..., 4]
    cls_probs = predictions[..., 5:5 + num_classes]
    cls_conf = jnp.max(cls_probs, axis=-1)
    cls_id = jnp.argmax(cls_probs, axis=-1).astype(jnp.float32)
    score = obj * cls_conf
    keep_conf = score >= conf_threshold

    def one_image(boxes_i, obj_i, cls_conf_i, cls_id_i, score_i, keep_i):
        k = min(pre_topk, boxes_i.shape[0])
        sort_score = jnp.where(keep_i, score_i, -jnp.inf)
        top_score, order = jax.lax.top_k(sort_score, k)
        b = boxes_i[order]
        valid = jnp.isfinite(top_score)
        cls_for_nms = None if class_agnostic else cls_id_i[order]
        if use_pallas:
            # the Pallas kernel takes boxes only: per-class via the
            # coordinate-offset trick (fine at gen1/gen4 class counts;
            # the default XLA path uses the exact class mask)
            from .nms_pallas import nms_mask_pallas
            b_nms = b if cls_for_nms is None \
                else b + cls_for_nms[:, None] * _CLASS_OFFSET
            keep = nms_mask_pallas(b_nms, nms_threshold, valid)
        else:
            keep = nms_mask(b, nms_threshold, valid, cls_for_nms)
        det = jnp.concatenate(
            [b, obj_i[order, None], cls_conf_i[order, None],
             cls_id_i[order, None]], axis=-1)               # [k, 7]
        # compact kept rows to the front: stable sort puts keep==True first
        # while preserving score order
        perm = jnp.argsort(~keep, stable=True)
        if k < max_dets:
            det = jnp.pad(det, ((0, max_dets - k), (0, 0)))
            perm = jnp.pad(perm, (0, max_dets - k),
                           constant_values=det.shape[0] - 1)
        out = det[perm[:max_dets]]
        n_kept = jnp.minimum(jnp.sum(keep), max_dets)
        out_valid = jnp.arange(max_dets) < n_kept
        out = jnp.where(out_valid[:, None], out, 0.0)
        return out, out_valid

    return jax.vmap(one_image)(boxes, obj, cls_conf, cls_id, score, keep_conf)


def nms_numpy(boxes_xyxy: np.ndarray, scores: np.ndarray,
              iou_threshold: float) -> np.ndarray:
    """Host NMS (returns kept indices, score-desc order). Uses the native
    C++ library when available; pure-numpy fallback below."""
    if len(boxes_xyxy):
        from ..native import nms as native_nms
        kept = native_nms(np.asarray(boxes_xyxy), np.asarray(scores), None,
                          iou_threshold)
        if kept is not None:
            return kept
    order = np.argsort(-scores, kind="stable")
    boxes = boxes_xyxy[order]
    x0, y0, x1, y1 = boxes.T
    areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    keep = []
    alive = np.ones(len(order), bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        xx0 = np.maximum(x0[i], x0[i + 1:])
        yy0 = np.maximum(y0[i], y0[i + 1:])
        xx1 = np.minimum(x1[i], x1[i + 1:])
        yy1 = np.minimum(y1[i], y1[i + 1:])
        inter = (np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
                 * ((xx0 < xx1) & (yy0 < yy1)))
        iou = inter / np.maximum(areas[i] + areas[i + 1:] - inter, 1e-16)
        alive[i + 1:] &= iou <= iou_threshold
    return np.asarray(keep, np.int64)


def batched_nms_numpy(boxes_xyxy: np.ndarray, scores: np.ndarray,
                      class_ids: np.ndarray, iou_threshold: float) -> np.ndarray:
    if len(boxes_xyxy) == 0:
        return np.zeros((0,), np.int64)
    from ..native import nms as native_nms
    kept = native_nms(np.asarray(boxes_xyxy), np.asarray(scores),
                      np.asarray(class_ids), iou_threshold)
    if kept is not None:
        return kept
    off = boxes_xyxy + class_ids[:, None].astype(np.float64) * _CLASS_OFFSET
    return nms_numpy(off, scores, iou_threshold)
