"""Detection losses (pure JAX).

Reference semantics: models/detection/yolox/models/losses.py and the
loss assembly in yolo_head.py:563-597. All functions are elementwise /
masked so they compose with static-shape batching.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import elementwise_iou


def iou_loss(pred_cxcywh: jnp.ndarray, target_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU^2 per box (reference: losses.py:40-41). Inputs [..., 4]."""
    iou = elementwise_iou(pred_cxcywh, target_cxcywh, fmt="cxcywh")
    return 1.0 - iou ** 2


def giou_loss(pred_cxcywh: jnp.ndarray, target_cxcywh: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU per box (reference: losses.py:42-51)."""
    p0 = pred_cxcywh[..., :2] - pred_cxcywh[..., 2:] / 2
    p1 = pred_cxcywh[..., :2] + pred_cxcywh[..., 2:] / 2
    g0 = target_cxcywh[..., :2] - target_cxcywh[..., 2:] / 2
    g1 = target_cxcywh[..., :2] + target_cxcywh[..., 2:] / 2
    tl = jnp.maximum(p0, g0)
    br = jnp.minimum(p1, g1)
    inter = jnp.prod(br - tl, -1) * jnp.all(tl < br, -1)
    area_p = jnp.prod(pred_cxcywh[..., 2:], -1)
    area_g = jnp.prod(target_cxcywh[..., 2:], -1)
    union = area_p + area_g - inter
    iou = inter / jnp.maximum(union, 1e-16)
    c_tl = jnp.minimum(p0, g0)
    c_br = jnp.maximum(p1, g1)
    area_c = jnp.maximum(jnp.prod(c_br - c_tl, -1), 1e-16)
    giou = iou - (area_c - union) / area_c
    return 1.0 - jnp.clip(giou, -1.0, 1.0)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """torchvision.ops.sigmoid_focal_loss semantics (reference: losses.py:69-85)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def bce_probs(probs: jnp.ndarray, targets: jnp.ndarray,
              eps: float = 1e-12) -> jnp.ndarray:
    """BCE on probabilities, log clamped like torch.F.binary_cross_entropy
    (used by SimOTA's cls cost on sqrt(sigmoid*sigmoid) probs,
    reference: yolo_head.py:660-668). torch clamps log at -100."""
    logp = jnp.maximum(jnp.log(jnp.maximum(probs, eps)), -100.0)
    log1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - probs, eps)), -100.0)
    return -(targets * logp + (1.0 - targets) * log1mp)
