"""Box geometry ops (pure JAX, static shapes).

Covers the reference's torch/torchvision box helpers
(reference: models/detection/yolox/utils/boxes.py) with vectorized,
mask-friendly formulations suitable for jit/TPU.

Formats:
  xyxy    : [x0, y0, x1, y1]
  cxcywh  : [center_x, center_y, w, h]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [0.5 * (x0 + x1), 0.5 * (y0 + y1), x1 - x0, y1 - y0], axis=-1)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, fmt: str = "xyxy") -> jnp.ndarray:
    """IoU matrix [..., M, N] for a[..., M, 4] vs b[..., N, 4].

    Matches the reference's `bboxes_iou` semantics
    (reference: yolox/utils/boxes.py:89-113): intersection counted only
    when strictly tl < br; denominator has no epsilon for xyxy=True path,
    callers add their own epsilon where the reference does.
    """
    if fmt == "cxcywh":
        a = cxcywh_to_xyxy(a)
        b = cxcywh_to_xyxy(b)
    tl = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])   # [M,N,2]
    br = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = br - tl
    valid = jnp.all(tl < br, axis=-1)
    inter = jnp.prod(wh, axis=-1) * valid
    area_a = jnp.prod(a[..., 2:] - a[..., :2], axis=-1)
    area_b = jnp.prod(b[..., 2:] - b[..., :2], axis=-1)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-16)


def elementwise_iou(a: jnp.ndarray, b: jnp.ndarray, fmt: str = "cxcywh") -> jnp.ndarray:
    """IoU for matched pairs a[..., 4] vs b[..., 4] -> [...]."""
    if fmt == "cxcywh":
        a = cxcywh_to_xyxy(a)
        b = cxcywh_to_xyxy(b)
    tl = jnp.maximum(a[..., :2], b[..., :2])
    br = jnp.minimum(a[..., 2:], b[..., 2:])
    valid = jnp.all(tl < br, axis=-1)
    inter = jnp.prod(br - tl, axis=-1) * valid
    area_a = jnp.prod(a[..., 2:] - a[..., :2], axis=-1)
    area_g = jnp.prod(b[..., 2:] - b[..., :2], axis=-1)
    return inter / jnp.maximum(area_a + area_g - inter, 1e-16)
