"""SimOTA dynamic label assignment — fully batched, static shapes.

The reference implements SimOTA with a per-image Python loop, dynamic
boolean compaction and in-place mask mutation
(reference: models/detection/yolox/models/yolo_head.py:606-774 and the
ignore-label variant :974-1148). That formulation cannot be traced by
XLA. This module re-derives the same assignment as masked dense algebra
over fixed [G, A] matrices so the whole thing jits and vmaps:

  * geometry gate: anchor center within +-1.5*stride of a GT center
    (strict inequalities, yolo_head.py:702-732)
  * candidate anchors = in-center of ANY valid GT; anchors in-center of
    only ignore-labeled GTs are excluded and flagged `ignore`
    (yolo_head.py:1096-1148)
  * cost = cls-BCE(sqrt(sig(cls)*sig(obj)), onehot) + 3*(-log iou)
    + 1e6 * ~in-center  (yolo_head.py:655-675)
  * dynamic-k = clamp(int(sum top-10 IoU), min=1) per GT; the k
    lowest-cost candidates are matched (yolo_head.py:734-754)
  * anchors matched to >1 GT keep only the globally cheapest GT
    (yolo_head.py:756-762)

The cls-BCE term is decomposed so the [G, A, C] tensor is never
materialized:  BCE(p, onehot_g) summed over C
             = sum_c -log(1-p_c)  +  [-log p_{c_g} + log(1-p_{c_g})].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import cxcywh_to_xyxy, pairwise_iou
from .losses import bce_probs

_BIG = 1.0e15
_TOPK_IOU = 10


def _extract_k(x: jnp.ndarray, k: int, largest: bool) -> jnp.ndarray:
    """Values of the k largest/smallest entries along the last axis,
    in extraction (sorted) order, WITHOUT a full sort.

    XLA lowers lax.top_k and argsort on TPU to full stable sorts of the
    whole row — measured as ~23% of the gen4 train step (three
    [48,64,5040] sorts, tools/trace_agg.py). SimOTA only ever needs
    k <= 10 extrema (dynamic-k = clamp(int(sum top-10 IoU)) <= 10), so
    k cheap reduction passes (arg-extremum + index mask) replace the
    sorts. Ties extract equal VALUES in index order, so the value list
    matches the sorted one exactly."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    fill = -jnp.inf if largest else jnp.inf

    def body(xc, _):
        if largest:
            v, i = jnp.max(xc, axis=-1), jnp.argmax(xc, axis=-1)
        else:
            v, i = jnp.min(xc, axis=-1), jnp.argmin(xc, axis=-1)
        return jnp.where(iota == i[..., None], fill, xc), v

    _, vs = jax.lax.scan(body, x, None, length=k)
    return jnp.moveaxis(vs, 0, -1)                          # [..., k]


def _cheapest_k_mask(cost: jnp.ndarray, dynamic_k: jnp.ndarray,
                     K: int) -> jnp.ndarray:
    """Mask of the dynamic_k cheapest entries per row (stable rank
    semantics: ties broken by ascending index, exactly like
    ranks-from-double-argsort) without sorting. Requires dynamic_k <= K.

    rank < k  <=>  cost < kth   OR   (cost == kth  AND
                   #ties-at-kth up to and incl. this entry <= k - #below)
    where kth is the k-th smallest value (duplicates counted)."""
    bot = _extract_k(cost, K, largest=False)                       # [G, K]
    kth = jnp.take_along_axis(
        bot, jnp.clip(dynamic_k - 1, 0, K - 1)[:, None], axis=-1)  # [G, 1]
    below = cost < kth
    eq = cost == kth
    tie_budget = dynamic_k[:, None] - jnp.sum(below, axis=1, keepdims=True)
    return below | (eq & (jnp.cumsum(eq, axis=1) <= tie_budget))


class AssignResult(NamedTuple):
    fg: jnp.ndarray            # [A] bool — anchor is a matched foreground
    ignore: jnp.ndarray        # [A] bool — exclude from objectness loss
    matched_gt: jnp.ndarray    # [A] int — index of matched GT (where fg)
    pred_iou: jnp.ndarray      # [A] — IoU of the matched (pred, GT) pair
    num_fg: jnp.ndarray        # scalar — number of matched anchors
    num_gt: jnp.ndarray        # scalar — number of valid GTs


def mark_low_conf_as_ignore(labels: jnp.ndarray, thresh: jnp.ndarray,
                            ignore_label: int) -> jnp.ndarray:
    """Stamp `ignore_label` on pseudo boxes below per-class conf thresholds
    (reference: yolo_head.py:382-401). labels [..., G, 7] yolox layout."""
    cls_idx = labels[..., 0]
    obj_conf = labels[..., 5]
    cls_conf = labels[..., 6]
    per_box_thresh = thresh[jnp.clip(cls_idx.astype(jnp.int32), 0,
                                     thresh.shape[0] - 1)]
    low = (obj_conf < per_box_thresh) | (cls_conf < per_box_thresh)
    nonpad = jnp.sum(labels, axis=-1) > 0
    new_cls = jnp.where(low & nonpad, float(ignore_label), cls_idx)
    return labels.at[..., 0].set(new_cls)


def simota_assign(labels: jnp.ndarray,
                  pred_boxes: jnp.ndarray,
                  obj_logits: jnp.ndarray,
                  cls_logits: jnp.ndarray,
                  anchor_centers: jnp.ndarray,
                  anchor_strides: jnp.ndarray,
                  num_classes: int,
                  ignore_label: int = 1024) -> AssignResult:
    """Assign anchors of ONE frame. vmap over frames for a batch.

    labels        [G, 7]  yolox layout [cls, cx, cy, w, h, obj_c, cls_c];
                          all-zero rows are padding
    pred_boxes    [A, 4]  decoded absolute (cx, cy, w, h)
    obj_logits    [A]
    cls_logits    [A, C]
    anchor_centers[A, 2]  (x, y) = (shift + 0.5) * stride
    anchor_strides[A]
    """
    f32 = jnp.float32
    labels = labels.astype(f32)
    gt_cls = labels[:, 0]
    gt_boxes = labels[:, 1:5]
    nonpad = jnp.sum(labels, axis=-1) > 0                        # [G]
    is_ignore_gt = nonpad & (gt_cls == ignore_label)
    valid_gt = nonpad & (gt_cls != ignore_label)

    # --- geometry gate (strict, radius 1.5 strides) ---
    dist = 1.5 * anchor_strides                                   # [A]
    dx = anchor_centers[None, :, 0] - gt_boxes[:, None, 0]        # [G, A]
    dy = anchor_centers[None, :, 1] - gt_boxes[:, None, 1]
    in_center = ((dx > -dist) & (dx < dist) & (dy > -dist) & (dy < dist))

    in_center_valid = in_center & valid_gt[:, None]
    in_center_nonpad = in_center & nonpad[:, None]
    candidate = jnp.any(in_center_valid, axis=0)                  # [A]
    covered_any = jnp.any(in_center_nonpad, axis=0)
    ignore_anchor = covered_any & ~candidate                      # [A]

    # --- pairwise IoU (masked) ---
    iou = pairwise_iou(cxcywh_to_xyxy(gt_boxes.astype(f32)),
                       cxcywh_to_xyxy(pred_boxes.astype(f32)))    # [G, A]
    pair_ok = valid_gt[:, None] & candidate[None, :]
    iou = jnp.where(pair_ok, iou, 0.0)

    # --- classification cost without [G, A, C] ---
    p = jnp.sqrt(jax.nn.sigmoid(cls_logits.astype(f32)) *
                 jax.nn.sigmoid(obj_logits.astype(f32))[:, None])  # [A, C]
    neg = bce_probs(p, jnp.zeros_like(p))                          # -log(1-p)
    pos = bce_probs(p, jnp.ones_like(p))                           # -log(p)
    neg_sum = jnp.sum(neg, axis=-1)                                # [A]
    cls_idx = jnp.clip(gt_cls.astype(jnp.int32), 0, num_classes - 1)  # [G]
    delta = (pos - neg)[:, cls_idx].T                              # [G, A]
    cls_cost = neg_sum[None, :] + delta

    cost = (cls_cost
            + 3.0 * (-jnp.log(iou + 1e-8))
            + 1e6 * (~in_center).astype(f32))
    cost = jnp.where(pair_ok, cost, _BIG)

    # --- dynamic-k from top-10 IoU mass per GT ---
    K = min(_TOPK_IOU, iou.shape[1])
    topk_iou = _extract_k(iou, K, largest=True)                    # [G, <=10]
    dynamic_k = jnp.maximum(jnp.sum(topk_iou, axis=-1).astype(jnp.int32), 1)
    dynamic_k = jnp.where(valid_gt, dynamic_k, 0)                  # [G]

    # --- k cheapest candidates per GT (stable rank < k, sort-free) ---
    matching = _cheapest_k_mask(cost, dynamic_k, K) & (cost < _BIG / 2)

    # --- conflict resolution: globally cheapest GT wins the anchor ---
    anchor_deg = jnp.sum(matching, axis=0)                         # [A]
    conflict = anchor_deg > 1
    best_g = jnp.argmin(cost, axis=0)                              # [A]
    g_idx = jnp.arange(labels.shape[0])
    matching = jnp.where(conflict[None, :],
                         g_idx[:, None] == best_g[None, :],
                         matching)

    fg = jnp.any(matching, axis=0)
    matched_gt = jnp.argmax(matching, axis=0)
    pred_iou = jnp.sum(matching * iou, axis=0)
    return AssignResult(fg=fg, ignore=ignore_anchor,
                        matched_gt=matched_gt, pred_iou=pred_iou,
                        num_fg=jnp.sum(fg), num_gt=jnp.sum(valid_gt))
