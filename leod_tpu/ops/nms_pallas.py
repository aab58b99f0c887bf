"""Pallas TPU kernel: greedy NMS suppression sweep.

The XLA formulation (ops/nms.py) runs K sequential `fori_loop` steps,
each a masked [K] vector update against a [K, K] IoU matrix — every step
round-trips the keep vector through HBM-level fusion boundaries. Here
the whole sweep runs inside one Pallas kernel with the IoU tiles and the
keep vector resident in VMEM (K=1024: IoU matrix 4 MB, well within the
~16 MB budget), and the box coordinates in VMEM for on-the-fly IoU
computation.

Boxes must be score-DESC sorted xyxy, padded to a multiple of 128 with
invalid rows masked. Per-class semantics use the same coordinate-offset
trick as ops/nms.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _nms_kernel(boxes_ref, valid_ref, thresh_ref, keep_ref):
    """boxes [K, 128] (xyxy in cols 0..3, rest zero), valid [1, K] f32,
    thresh [1, 1] SMEM, keep [1, K] f32 out."""
    k = boxes_ref.shape[0]
    x0 = boxes_ref[:, 0]
    y0 = boxes_ref[:, 1]
    x1 = boxes_ref[:, 2]
    y1 = boxes_ref[:, 3]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)   # [K]
    thresh = thresh_ref[0, 0]

    # full pairwise IoU in VMEM: [K, K]
    xx0 = jnp.maximum(x0[:, None], x0[None, :])
    yy0 = jnp.maximum(y0[:, None], y0[None, :])
    xx1 = jnp.minimum(x1[:, None], x1[None, :])
    yy1 = jnp.minimum(y1[:, None], y1[None, :])
    iw = jnp.maximum(xx1 - xx0, 0.0)
    ih = jnp.maximum(yy1 - yy0, 0.0)
    ok = (xx0 < xx1) & (yy0 < yy1)
    inter = jnp.where(ok, iw * ih, 0.0)
    union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-16)
    suppress = ((inter / union) > thresh).astype(jnp.float32)       # [K, K]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)            # [1, K]

    def body(i, keep):
        # row i extracted with a one-hot matmul: no dynamic indexing,
        # stays on the MXU and everything lives in VMEM/registers
        oh = (col == i).astype(jnp.float32)                         # [1, K]
        row = jnp.dot(oh, suppress, preferred_element_type=jnp.float32)
        ki = jnp.sum(keep * oh)
        kill = (row > 0.5) & (col > i) & (ki > 0.0)
        return jnp.where(kill, 0.0, keep)

    keep_ref[:] = jax.lax.fori_loop(0, k, body, valid_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_mask_pallas(boxes_xyxy: jnp.ndarray, iou_threshold,
                    valid: jnp.ndarray, interpret: bool = False
                    ) -> jnp.ndarray:
    """Drop-in for ops.nms.nms_mask (score-desc-sorted inputs).

    boxes_xyxy [K, 4] f32, valid [K] bool -> keep [K] bool.
    K is padded to a multiple of 128 internally.
    """
    k = boxes_xyxy.shape[0]
    k_pad = ((k + _LANE - 1) // _LANE) * _LANE
    boxes = jnp.zeros((k_pad, _LANE), jnp.float32)
    boxes = boxes.at[:k, :4].set(boxes_xyxy.astype(jnp.float32))
    v = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(
        valid.astype(jnp.float32))
    thresh = jnp.asarray([[iou_threshold]], jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, v, thresh)
    return keep[0, :k] > 0.0
