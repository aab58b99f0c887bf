"""Detector facade: recurrent backbone + PAFPN + YOLOX head.

Mirrors the reference's two-phase API
(reference: models/detection/yolox_extension/models/detector.py:18-91):
  forward_backbone : one timestep, carries LSTM state
  forward_detect   : batched over harvested frames (FPN + head)
but as pure functions over an explicit variables pytree so callers can
jit/scan/pjit them freely.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .backbone import (BackboneStates, RVTBackbone, init_states)
from .fpn import PAFPN
from .head import Anchors, YOLOXHead, decode_outputs, make_anchors, yolox_loss

Variables = Dict[str, Any]


class Detector:
    """Stateless module bundle; all methods are pure given `variables`.

    fused_inference: use the forward-only Pallas MaxViT block-pair
    kernels (ops/maxvit_pallas.py) on the no-grad paths (eval, bench,
    pseudo-labeling). MEASURED NEGATIVE in context on v5e: the kernel
    wins in isolation (1.17 vs 1.37 ms marginal per stage-1 pair at
    B=16) but loses end-to-end (bench 4,620-4,719 vs 4,881 frames/s)
    because the pallas_call is a fusion barrier for XLA's cross-stage
    scheduling — so the default stays False (docs/benchmarks.md).
    "stage" fuses the whole stage (pairs + ConvLSTM) so the barrier
    lands on a stage boundary instead of splitting one.
    Training always takes the XLA path (the kernels define no VJP).
    """

    def __init__(self, cfg: ModelConfig, dtype=jnp.bfloat16,
                 fused_inference=False):
        self.cfg = cfg
        self.dtype = dtype
        self.fused_inference = (fused_inference
                                if isinstance(fused_inference, str)
                                else bool(fused_inference))
        self.backbone = RVTBackbone(cfg.backbone, dtype=dtype)
        self.fpn = PAFPN(cfg.fpn, cfg.fpn_in_channels, dtype=dtype)
        self.head = YOLOXHead(cfg.head, cfg.fpn_in_channels, dtype=dtype)
        self.anchors: Anchors = make_anchors(cfg.backbone.in_res_hw,
                                             cfg.head.strides)

    # -- initialization -----------------------------------------------------
    def init(self, rng: jax.Array, batch_size: int = 1) -> Variables:
        # jit the whole init: eager flax init dispatches hundreds of tiny
        # ops, which is pathologically slow over a remote-TPU tunnel
        return jax.jit(self._init_impl, static_argnums=(1,))(rng, batch_size)

    def _init_impl(self, rng: jax.Array, batch_size: int) -> Variables:
        h, w = self.cfg.backbone.in_res_hw
        x = jnp.zeros((batch_size, h, w, self.cfg.backbone.input_channels),
                      self.dtype)
        states = init_states(self.cfg.backbone, batch_size, self.dtype)
        r1, r2, r3 = jax.random.split(rng, 3)
        bb_vars = self.backbone.init(r1, x, states)
        feats, _ = self.backbone.apply(bb_vars, x, states)
        fpn_vars = self.fpn.init(r2, feats)
        fpn_out = self.fpn.apply(fpn_vars, feats)
        head_vars = self.head.init(r3, fpn_out)
        return {
            "params": {"backbone": bb_vars["params"],
                       "fpn": fpn_vars["params"],
                       "head": head_vars["params"]},
            "batch_stats": {"fpn": fpn_vars.get("batch_stats", {}),
                            "head": head_vars.get("batch_stats", {})},
        }

    def init_states(self, batch_size: int, dtype=None) -> BackboneStates:
        return init_states(self.cfg.backbone, batch_size,
                           dtype or self.dtype)

    # -- forward ------------------------------------------------------------
    def forward_backbone(self, variables: Variables, x: jnp.ndarray,
                         states: BackboneStates,
                         token_mask: Optional[jnp.ndarray] = None,
                         fused: bool = False):
        """One timestep: x [B, H, W, C] -> ({stage: feat}, new_states).
        fused=True routes attention through the forward-only Pallas
        kernels — no-grad callers only."""
        return self.backbone.apply({"params": variables["params"]["backbone"]},
                                   x.astype(self.dtype), states, token_mask,
                                   fused)

    def forward_stage1_pre(self, variables: Variables, x: jnp.ndarray):
        """Stage-1 downsample+attention only; batch over timesteps freely."""
        return self.backbone.apply({"params": variables["params"]["backbone"]},
                                   x.astype(self.dtype),
                                   method="stage1_pre")

    def forward_from_stage1(self, variables: Variables, y1: jnp.ndarray,
                            states: BackboneStates):
        """Recurrent remainder given precomputed stage-1 features."""
        return self.backbone.apply({"params": variables["params"]["backbone"]},
                                   y1, states, method="from_stage1")

    def forward_detect(self, variables: Variables, feats,
                       train: bool = False):
        """FPN + head over harvested frames.

        Returns (decoded [M, A, 5+C], updated_batch_stats_or_None).
        Train mode: obj/cls stay logits; eval: sigmoided probabilities.
        """
        fpn_vars = {"params": variables["params"]["fpn"],
                    "batch_stats": variables["batch_stats"]["fpn"]}
        head_vars = {"params": variables["params"]["head"],
                     "batch_stats": variables["batch_stats"]["head"]}
        if train:
            fpn_out, fpn_upd = self.fpn.apply(fpn_vars, feats, train=True,
                                              mutable=["batch_stats"])
            raw, head_upd = self.head.apply(head_vars, fpn_out, train=True,
                                            mutable=["batch_stats"])
            decoded = decode_outputs(raw, self.anchors, apply_sigmoid=False)
            new_stats = {"fpn": fpn_upd["batch_stats"],
                         "head": head_upd["batch_stats"]}
            return decoded, new_stats
        fpn_out = self.fpn.apply(fpn_vars, feats)
        raw = self.head.apply(head_vars, fpn_out)
        return decode_outputs(raw, self.anchors, apply_sigmoid=True), None

    def loss(self, train_out: jnp.ndarray, labels: jnp.ndarray,
             frame_mask: jnp.ndarray):
        return yolox_loss(train_out, labels, frame_mask, self.anchors,
                          self.cfg.head)
