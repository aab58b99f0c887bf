"""YOLOX decoupled head: forward, decode, and the SimOTA training loss
(reference: models/detection/yolox/models/yolo_head.py).

The reference computes losses with a per-image Python loop and ragged
concatenation (yolo_head.py:403-597); here the whole loss is one batched
masked computation over [M, A] (M = harvested frames, A = anchors), with
the LEOD ignore-region variant (yolo_head.py:776-972) folded in as an
anchor mask — the plain path is the special case with no ignore boxes.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import HeadConfig
from ..ops.losses import bce_with_logits, iou_loss, sigmoid_focal_loss
from ..ops.simota import mark_low_conf_as_ignore, simota_assign
from .layers import ConvBNAct, DWConvBlock

_PRIOR_PROB = 0.01


class Anchors(NamedTuple):
    centers: jnp.ndarray   # [A, 2] pixel centers: (shift + 0.5) * stride
    shifts: jnp.ndarray    # [A, 2] integer grid shifts (x, y)
    strides: jnp.ndarray   # [A]
    hw: Tuple[Tuple[int, int], ...]


def make_anchors(in_res_hw: Tuple[int, int],
                 strides: Sequence[int]) -> Anchors:
    centers, shifts, strs, hw = [], [], [], []
    for s in strides:
        h, w = in_res_hw[0] // s, in_res_hw[1] // s
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        sh = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1).astype(jnp.float32)
        shifts.append(sh)
        centers.append((sh + 0.5) * s)
        strs.append(jnp.full((h * w,), float(s), jnp.float32))
        hw.append((h, w))
    return Anchors(jnp.concatenate(centers), jnp.concatenate(shifts),
                   jnp.concatenate(strs), tuple(hw))


class YOLOXHead(nn.Module):
    """Per-scale stems + decoupled cls/reg branches
    (reference: yolo_head.py:46-145). Returns raw maps [B, h, w, 5+C]
    per level, channel layout (reg 4, obj 1, cls C), logits."""
    cfg: HeadConfig
    in_channels: Tuple[int, ...]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fpn_feats, train: bool = False):
        c = self.cfg
        # width follows in_channels[-1]/1024 scaling (yolo_head.py:57-66)
        hidden = int(256 * (self.in_channels[-1] / 1024))
        conv = DWConvBlock if c.depthwise else ConvBNAct
        bias_init = nn.initializers.constant(
            -math.log((1 - _PRIOR_PROB) / _PRIOR_PROB))
        outs = []
        for k, x in enumerate(fpn_feats):
            x = ConvBNAct(hidden, 1, act=c.act, dtype=self.dtype,
                          name=f"stem{k}")(x, train)
            cls_f = x
            for j in range(2):
                cls_f = conv(hidden, 3, act=c.act, dtype=self.dtype,
                             name=f"cls_conv{k}_{j}")(cls_f, train)
            reg_f = x
            for j in range(2):
                reg_f = conv(hidden, 3, act=c.act, dtype=self.dtype,
                             name=f"reg_conv{k}_{j}")(reg_f, train)
            cls_out = nn.Conv(c.num_classes, (1, 1), dtype=self.dtype,
                              bias_init=bias_init, name=f"cls_pred{k}")(cls_f)
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype,
                              name=f"reg_pred{k}")(reg_f)
            obj_out = nn.Conv(1, (1, 1), dtype=self.dtype,
                              bias_init=bias_init, name=f"obj_pred{k}")(reg_f)
            outs.append(jnp.concatenate([reg_out, obj_out, cls_out], -1))
        return outs


def decode_outputs(raw_levels, anchors: Anchors,
                   apply_sigmoid: bool) -> jnp.ndarray:
    """Flatten + decode to absolute boxes: [B, A, 4 + 1 + C].

    xy = (pred + shift) * stride; wh = exp(pred) * stride
    (reference: yolo_head.py:289-332). obj/cls stay logits unless
    `apply_sigmoid` (inference)."""
    flat = jnp.concatenate(
        [x.reshape(x.shape[0], -1, x.shape[-1]) for x in raw_levels], axis=1)
    xy = (flat[..., 0:2] + anchors.shifts) * anchors.strides[:, None]
    wh = jnp.exp(flat[..., 2:4]) * anchors.strides[:, None]
    rest = flat[..., 4:]
    if apply_sigmoid:
        rest = jax.nn.sigmoid(rest)
    return jnp.concatenate([xy, wh, rest], axis=-1)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def _bbox_loss_weights(cfg: HeadConfig, labels: jnp.ndarray,
                       matched_gt: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """Teacher-confidence bbox loss weights, mean-normalized over all fg
    (reference: yolo_head.py:358-380,550-555). Returns [M, A]."""
    spec = cfg.bbox_loss_weighting
    if not spec:
        return jnp.ones(fg.shape, jnp.float32)
    val, _, expr = spec.partition("-")
    obj_c = jnp.take_along_axis(labels[..., 5], matched_gt, axis=1)
    cls_c = jnp.take_along_axis(labels[..., 6], matched_gt, axis=1)
    w = {"obj": obj_c, "cls": cls_c, "objxcls": obj_c * cls_c}[val]
    if expr == "w**2":
        w = w ** 2
    fg_f = fg.astype(jnp.float32)
    mean = jnp.sum(w * fg_f) / jnp.maximum(jnp.sum(fg_f), 1.0)
    return w / jnp.maximum(mean, 1e-12)


def _top_bg_ignore_mask(cfg: HeadConfig, obj_logits: jnp.ndarray,
                        fg: jnp.ndarray) -> jnp.ndarray:
    """Exclude the top-k%-scoring background anchors from the objectness
    loss (reference: yolo_head.py:334-356, applied at :539-541,565-568).
    Per-frame, static shapes; parity-tested vs the reference
    (tests/test_loss_parity.py). Known intended divergence: the
    reference's ignore-region path (get_losses_w_ignore) never calls
    _get_highest_score_mask, so ignore_bg_k silently turns off for any
    batch containing an ignore box — an accident of the duplicated loss
    body (both knobs are off in every reference config). We apply it
    uniformly."""
    if cfg.ignore_bg_k <= 0:
        return jnp.zeros(fg.shape, bool)
    bg = ~fg
    n = (jnp.sum(bg, axis=1).astype(jnp.float32) * cfg.ignore_bg_k
         ).astype(jnp.int32)                                      # [M]
    score = jnp.where(bg, obj_logits, -jnp.inf)
    order = jnp.argsort(-score, axis=1, stable=True)
    rank = jnp.argsort(order, axis=1, stable=True)
    return bg & (rank < n[:, None])


def yolox_loss(train_out: jnp.ndarray, labels: jnp.ndarray,
               frame_mask: jnp.ndarray, anchors: Anchors,
               cfg: HeadConfig) -> Dict[str, jnp.ndarray]:
    """SimOTA-assigned detection loss over M harvested frames.

    train_out [M, A, 5+C] decoded boxes + obj/cls logits
    labels    [M, G, 7] yolox layout, zero rows = padding
    frame_mask[M] bool — padded frame slots contribute nothing

    Loss assembly per reference yolo_head.py:563-597 / :940-972:
      total = 5 * iou + 1 * obj + 1 * cls, each summed over the batch and
      divided by max(total_fg, 1); obj BCE skips ignore-region anchors.
    """
    f32 = jnp.float32
    train_out = train_out.astype(f32)
    labels = labels.astype(f32)
    if cfg.ignore_bbox_thresh is not None:
        labels = mark_low_conf_as_ignore(
            labels, jnp.asarray(cfg.ignore_bbox_thresh, f32), cfg.ignore_label)

    boxes = train_out[..., :4]
    obj_logits = train_out[..., 4]
    cls_logits = train_out[..., 5:]
    num_classes = cls_logits.shape[-1]

    assign = jax.vmap(
        lambda lab, bx, ob, cl: simota_assign(
            lab, bx, ob, cl, anchors.centers, anchors.strides,
            num_classes=num_classes, ignore_label=cfg.ignore_label)
    )(labels, boxes, obj_logits, cls_logits)

    fm = frame_mask
    fg = assign.fg & fm[:, None]                                 # [M, A]
    fg_f = fg.astype(f32)
    num_fg = jnp.sum(fg_f)
    num_gt = jnp.sum(assign.num_gt * fm)
    denom = jnp.maximum(num_fg, 1.0)

    # regression: 1 - IoU^2 on matched pairs
    gt_boxes = jnp.take_along_axis(
        labels[..., 1:5], assign.matched_gt[..., None], axis=1)  # [M, A, 4]
    bbox_w = _bbox_loss_weights(cfg, labels, assign.matched_gt, fg)
    loss_iou = jnp.sum(iou_loss(boxes, gt_boxes) * bbox_w * fg_f) / denom

    # objectness: BCE against the fg indicator, skipping ignore anchors,
    # padded frames, and optionally the top-k% confident background
    bg_ignore = _top_bg_ignore_mask(cfg, obj_logits, fg)
    obj_valid = fm[:, None] & ~assign.ignore & ~bg_ignore
    obj_fn = sigmoid_focal_loss if cfg.obj_focal_loss else bce_with_logits
    loss_obj = jnp.sum(obj_fn(obj_logits, fg_f) * obj_valid) / denom

    # classification: BCE against IoU-scaled one-hot on fg anchors
    cls_idx = jnp.clip(
        jnp.take_along_axis(labels[..., 0], assign.matched_gt, axis=1
                            ).astype(jnp.int32), 0, num_classes - 1)
    cls_target = (jax.nn.one_hot(cls_idx, num_classes, dtype=f32)
                  * assign.pred_iou[..., None])
    loss_cls = jnp.sum(
        bce_with_logits(cls_logits, cls_target) * (bbox_w * fg_f)[..., None]
    ) / denom

    # optional L1 on raw reg outputs vs grid-space targets (reference:
    # yolo_head.py:560-580,599-605). Decoding is exactly invertible
    # (xy = (raw+shift)*stride, wh = exp(raw)*stride), so the residual in
    # raw space is |xy - gt_xy|/stride and |log(wh/stride) -
    # log(gt_wh/stride + eps)| — no need to thread raw maps to the loss.
    loss_l1 = jnp.zeros((), f32)
    if cfg.use_l1:
        st = anchors.strides[None, :, None]
        l1 = jnp.concatenate([
            jnp.abs(boxes[..., 0:2] - gt_boxes[..., 0:2]) / st,
            jnp.abs(jnp.log(jnp.maximum(boxes[..., 2:4], 1e-20) / st)
                    - jnp.log(gt_boxes[..., 2:4] / st + 1e-8)),
        ], axis=-1)
        loss_l1 = jnp.sum(l1 * (bbox_w * fg_f)[..., None]) / denom

    loss_iou = cfg.reg_weight * loss_iou
    loss_obj = cfg.obj_weight * loss_obj
    loss_cls = cfg.cls_weight * loss_cls
    out = {
        "loss": loss_iou + loss_obj + loss_cls + loss_l1,
        "iou_loss": loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "num_fg": num_fg / jnp.maximum(num_gt, 1.0),
    }
    if cfg.use_l1:
        out["l1_loss"] = loss_l1
    return out
