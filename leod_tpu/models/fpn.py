"""YOLO PAFPN over backbone stages (2, 3, 4)
(reference: models/detection/yolox_extension/models/yolo_pafpn.py:109-140).

Top-down lateral+upsample+CSP, then bottom-up strided-conv+CSP; emits
three scales at strides 8 / 16 / 32. NHWC.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import FPNConfig
from .layers import CSPLayer, ConvBNAct, DWConvBlock, upsample2x_nearest


class PAFPN(nn.Module):
    cfg: FPNConfig
    in_channels: Tuple[int, int, int]   # dims of stages 2, 3, 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: dict {stage_id: [B, h, w, C]} -> 3-tuple of FPN maps."""
        c = self.cfg
        n = round(3 * c.depth)
        conv = DWConvBlock if c.depthwise else ConvBNAct
        c2, c1, c0 = self.in_channels
        x2, x1, x0 = (feats[s] for s in c.in_stages)

        fpn_out0 = ConvBNAct(c1, 1, act=c.act, dtype=self.dtype,
                             name="lateral_conv0")(x0, train)          # /32
        f_out0 = jnp.concatenate([upsample2x_nearest(fpn_out0), x1], -1)
        f_out0 = CSPLayer(c1, n, False, depthwise=c.depthwise, act=c.act,
                          dtype=self.dtype, name="C3_p4")(f_out0, train)  # /16

        fpn_out1 = ConvBNAct(c2, 1, act=c.act, dtype=self.dtype,
                             name="reduce_conv1")(f_out0, train)
        f_out1 = jnp.concatenate([upsample2x_nearest(fpn_out1), x2], -1)
        pan_out2 = CSPLayer(c2, n, False, depthwise=c.depthwise, act=c.act,
                            dtype=self.dtype, name="C3_p3")(f_out1, train)  # /8

        p_out1 = conv(c2, 3, 2, act=c.act, dtype=self.dtype,
                      name="bu_conv2")(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], -1)
        pan_out1 = CSPLayer(c1, n, False, depthwise=c.depthwise, act=c.act,
                            dtype=self.dtype, name="C3_n3")(p_out1, train)  # /16

        p_out0 = conv(c1, 3, 2, act=c.act, dtype=self.dtype,
                      name="bu_conv1")(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], -1)
        pan_out0 = CSPLayer(c0, n, False, depthwise=c.depthwise, act=c.act,
                            dtype=self.dtype, name="C3_n4")(p_out0, train)  # /32

        return (pan_out2, pan_out1, pan_out0)
