"""RVT recurrent MaxViT backbone (reference: maxvit_rnn.py:23-201).

4 stages; each = strided-conv downsample -> N x (window-attn ->
grid-attn) -> ConvLSTM. State (h, c) per stage is threaded explicitly
(no flax variables) so callers can `lax.scan` over time with donated
carries and shard the state table across a device mesh.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import BackboneConfig
from .layers import ConvDownsample, ConvLSTMCell, PartitionAttention

# per-stage LSTM state: (h, c), each [B, H/s, W/s, C_stage]
StageState = Tuple[jnp.ndarray, jnp.ndarray]
BackboneStates = Tuple[StageState, ...]
BackboneFeatures = Dict[int, jnp.ndarray]  # 1-indexed stage -> [B, h, w, C]


class RVTStage(nn.Module):
    """One backbone stage (reference: maxvit_rnn.py:142-201).

    Split into `pre` (downsample + attention, NOT recurrent) and `cell`
    (the ConvLSTM): the pre part of stage 1 can then be batched over all
    timesteps of a window at once (big MXU-friendly GEMMs) while only
    the recurrent chain is scanned."""
    cfg: BackboneConfig
    stage_dim: int
    downsample_factor: int
    num_blocks: int
    enable_token_masking: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        c = self.cfg
        self.down = ConvDownsample(self.stage_dim, self.downsample_factor,
                                   in_channels=c.input_channels,
                                   overlap=c.overlap_downsample,
                                   norm_affine=c.norm_affine,
                                   norm_eps=c.norm_eps,
                                   dtype=self.dtype, name="down")
        blocks = []
        for i in range(self.num_blocks):
            for kind, skip in (("window", i == 0), ("grid", False)):
                blocks.append(PartitionAttention(
                    self.stage_dim, c.partition_size, kind,
                    # downsample output is already LayerNormed
                    skip_first_norm=skip, dim_head=c.dim_head,
                    attention_bias=c.attention_bias, mlp_ratio=c.mlp_ratio,
                    mlp_act=c.mlp_act, mlp_gated=c.mlp_gated,
                    mlp_bias=c.mlp_bias, ls_init_value=c.ls_init_value,
                    norm_eps=c.norm_eps, dtype=self.dtype,
                    name=f"block{i}_{kind}"))
        self.blocks = blocks
        self.lstm = ConvLSTMCell(self.stage_dim, c.lstm_dws_conv,
                                 c.lstm_dws_conv_only_hidden,
                                 c.lstm_dws_conv_kernel_size,
                                 dtype=self.dtype, name="lstm")
        if self.enable_token_masking:
            self.mask_token = self.param(
                "mask_token", nn.initializers.normal(0.02),
                (1, 1, 1, self.stage_dim))

    def pre(self, x: jnp.ndarray,
            token_mask: Optional[jnp.ndarray] = None,
            fused: bool = False) -> jnp.ndarray:
        x = self.down(x)
        if self.enable_token_masking and token_mask is not None:
            x = jnp.where(token_mask[..., None],
                          self.mask_token.astype(x.dtype), x)
        if fused and not self.is_initializing():
            # forward-only fused Pallas block pairs (ops/maxvit_pallas.py):
            # same params, read through the module's own variable tree
            from ..ops.maxvit_pallas import fused_block_pair
            params = self.variables["params"]
            c = self.cfg
            for i in range(self.num_blocks):
                x = fused_block_pair(
                    x, params[f"block{i}_window"], params[f"block{i}_grid"],
                    c.partition_size, skip_first_norm=(i == 0),
                    dim_head=c.dim_head, act=c.mlp_act, gated=c.mlp_gated,
                    eps=c.norm_eps)
            return x
        from .layers import _ATTN_TOKENS
        if _ATTN_TOKENS and not self.is_initializing():
            # token-layout-persistent pairs: partition once, run each
            # whole block in [N, T, C], and relayout window->grid with
            # two ADJACENT transposes XLA can collapse (layers.py
            # _ATTN_TOKENS). Exact: every op between partitions is
            # per-token.
            from .layers import (grid_partition, grid_reverse,
                                 window_partition, window_reverse)
            ph, pw = self.cfg.partition_size
            b, h, w, _ = x.shape
            for i in range(self.num_blocks):
                t = window_partition(x, ph, pw)
                t = self.blocks[2 * i](t, tokens=True)
                y = window_reverse(t, ph, pw, h, w)
                t = grid_partition(y, ph, pw)
                t = self.blocks[2 * i + 1](t, tokens=True)
                x = grid_reverse(t, ph, pw, h, w)
            return x
        for blk in self.blocks:
            x = blk(x)
        return x

    def cell(self, y: jnp.ndarray, state: StageState
             ) -> Tuple[jnp.ndarray, StageState]:
        h, c = self.lstm(y, state)
        return h, (h, c)

    def __call__(self, x: jnp.ndarray, state: StageState,
                 token_mask: Optional[jnp.ndarray] = None,
                 fused=False) -> Tuple[jnp.ndarray, StageState]:
        """fused: False (XLA), True/"pair" (Pallas block pairs), or
        "stage" (whole stage — pairs + ConvLSTM — in one kernel,
        forward-only; falls back to "pair" under dws_conv)."""
        if (fused == "stage" and not self.is_initializing()
                and not self.cfg.lstm_dws_conv):
            from ..ops.maxvit_pallas import fused_stage
            x = self.down(x)
            if self.enable_token_masking and token_mask is not None:
                x = jnp.where(token_mask[..., None],
                              self.mask_token.astype(x.dtype), x)
            params = self.variables["params"]
            c = self.cfg
            h, cc = fused_stage(
                x, state[0].astype(x.dtype), state[1].astype(x.dtype),
                [(params[f"block{i}_window"], params[f"block{i}_grid"])
                 for i in range(self.num_blocks)],
                params["lstm"]["gates"], c.partition_size,
                skip_first_norm=True, dim_head=c.dim_head, act=c.mlp_act,
                gated=c.mlp_gated, eps=c.norm_eps)
            return h, (h, cc)
        return self.cell(self.pre(x, token_mask, bool(fused)), state)


class RVTBackbone(nn.Module):
    """Full recurrent backbone; one timestep per call
    (reference: maxvit_rnn.py:97-115)."""
    cfg: BackboneConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        c = self.cfg
        stages = []
        for k, (dim, nblk) in enumerate(zip(c.stage_dims, c.num_blocks)):
            stages.append(RVTStage(
                c, dim, c.patch_size if k == 0 else 2, nblk,
                enable_token_masking=c.enable_masking and k == 0,
                dtype=self.dtype, name=f"stage{k + 1}"))
        self.stages = stages

    def __call__(self, x: jnp.ndarray, states: BackboneStates,
                 token_mask: Optional[jnp.ndarray] = None,
                 fused: bool = False
                 ) -> Tuple[BackboneFeatures, BackboneStates]:
        """fused=True uses the forward-only Pallas block-pair kernels
        (no VJP — inference/eval paths only)."""
        features: BackboneFeatures = {}
        new_states: List[StageState] = []
        for k, stage in enumerate(self.stages):
            f_k = fused
            if fused == "stage1":           # whole-stage kernel, stage 1 only
                f_k = "stage" if k == 0 else False
            x, st = stage(x, states[k], token_mask if k == 0 else None,
                          f_k)
            features[k + 1] = x
            new_states.append(st)
        return features, tuple(new_states)

    def stage1_pre(self, x: jnp.ndarray,
                   token_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Non-recurrent part of stage 1 — batchable over timesteps."""
        return self.stages[0].pre(x, token_mask)

    def from_stage1(self, y1: jnp.ndarray, states: BackboneStates
                    ) -> Tuple[BackboneFeatures, BackboneStates]:
        """Continue from precomputed stage-1 attention output."""
        features: BackboneFeatures = {}
        new_states: List[StageState] = []
        x, st = self.stages[0].cell(y1, states[0])
        features[1] = x
        new_states.append(st)
        for k in range(1, len(self.stages)):
            x, st = self.stages[k](x, states[k])
            features[k + 1] = x
            new_states.append(st)
        return features, tuple(new_states)


def init_states(cfg: BackboneConfig, batch_size: int,
                dtype=jnp.float32) -> BackboneStates:
    """Zero LSTM state pytree for `batch_size` streams."""
    h, w = cfg.in_res_hw
    states = []
    for dim, stride in zip(cfg.stage_dims, cfg.stage_strides):
        shape = (batch_size, h // stride, w // stride, dim)
        states.append((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)))
    return tuple(states)


def reset_states(states: BackboneStates, reset: jnp.ndarray) -> BackboneStates:
    """Zero the states of batch rows where `reset` is True
    (replaces the reference's worker-keyed RNNStates.reset,
    modules/utils/detection.py:95-157).

    Reset by SELECTION, not multiplication: 0 * NaN is NaN, so a
    divergence that poisoned a slot's state would survive a
    multiplicative reset and contaminate every later sequence in that
    slot; where() actually clears it."""
    def apply(s):
        r = reset.reshape((-1,) + (1,) * (s.ndim - 1))
        return jnp.where(r, jnp.zeros((), s.dtype), s)

    return jax.tree.map(apply, states)
