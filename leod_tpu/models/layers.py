"""Core neural layers (flax.linen, NHWC layout throughout).

TPU-first re-design of the reference layer zoo: the reference keeps
NCHW torch layouts and converts to channels-last only around attention
(reference: models/layers/maxvit/maxvit.py, models/layers/rnn.py,
models/detection/yolox/models/network_blocks.py). Here everything is
NHWC so convs, attention and the ConvLSTM all hit XLA's native TPU
layouts with no transposes.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def get_act(name: str) -> Callable:
    return {
        "silu": jax.nn.silu, "swish": jax.nn.silu, "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.1),
        "gelu": jax.nn.gelu, "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh,
    }[name]


# ---------------------------------------------------------------------------
# MaxViT pieces
# ---------------------------------------------------------------------------

# experiment flag: route partition attention through the 6-D einsum form
# (no materialized partition transposes); flipped by benchmarking only
import os as _os
_ATTN_6D = _os.environ.get("LEOD_ATTN_6D", "0") == "1"
# token-layout-persistent block pairs (DEFAULT ON) — the WHOLE block
# (norm/attn/LayerScale/residual/MLP) runs in partitioned token layout
# [N, T, C] so the only ops between a block's un-partition and the next
# block's partition are the two adjacent transposes themselves, which
# XLA collapses (on the classic path real compute sits between them and
# all 4 transposes per pair materialize — trace r3: ~0.37 ms/step). LN,
# MLP, LayerScale and residuals are per-token, so the reordering is
# exact (tests/test_fused_attention.py). Measured round 5 on the chip:
# gen1 inference 5,788->6,691 f/s (+15.6%), gen1 train 1,047->1,246,
# gen4 inference 1,251->1,440, gen4 train 275->329 (docs/benchmarks.md).
# LEOD_ATTN_TOKENS=0 restores the per-block partition path.
_ATTN_TOKENS = _os.environ.get("LEOD_ATTN_TOKENS", "1") == "1"


def window_partition(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, wh*ww, C] (local windows)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def window_reverse(x: jnp.ndarray, wh: int, ww: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


def grid_partition(x: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*cellH*cellW, gh*gw, C] (dilated global grid)."""
    b, h, w, c = x.shape
    x = x.reshape(b, gh, h // gh, gw, w // gw, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, gh * gw, c)


def grid_reverse(x: jnp.ndarray, gh: int, gw: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // gh, w // gw, gh, gw, c)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(-1, h, w, c)


class SelfAttention(nn.Module):
    """MHSA (reference: maxvit.py:328-354).

    Two input forms, same params:
      * token sequences [N, T, C] (after window/grid partition), or
      * the UNPARTITIONED 6-D view [B, a1, a2, a3, a4, C] with
        `token_axes` naming which interleaved axes are tokens
        ("window": (a2, a4) = in-window rows/cols; "grid": (a1, a3)).
        The 6-D view is a FREE reshape of NHWC, so no partition
        transpose is ever materialized — any relayout the MXU needs is
        folded into the attention GEMMs by XLA (the explicit-partition
        path spends ~15% of device time on those copies, trace r3)."""
    dim: int
    dim_head: int = 32
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 token_axes: Optional[str] = None) -> jnp.ndarray:
        num_heads = self.dim // self.dim_head
        qkv = nn.Dense(self.dim * 3, use_bias=self.use_bias,
                       dtype=self.dtype, name="qkv")(x)
        scale = self.dim_head ** -0.5
        if token_axes is None:
            n, t, _ = qkv.shape
            qkv = qkv.reshape(n, t, num_heads, 3 * self.dim_head)
            q, k, v = jnp.split(qkv, 3, axis=-1)               # [N,T,h,dh]
            attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(q.dtype)
            out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(
                n, t, self.dim)
        else:
            qkv = qkv.reshape(qkv.shape[:-1] + (num_heads,
                                                3 * self.dim_head))
            q, k, v = jnp.split(qkv, 3, axis=-1)       # [b,a1,a2,a3,a4,h,d]
            if token_axes == "window":
                attn = jnp.einsum("bnpmqhd,bnPmQhd->bnmhpqPQ", q, k) * scale
            else:
                attn = jnp.einsum("bpnqmhd,bPnQmhd->bnmhpqPQ", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=(-2, -1)).astype(q.dtype)
            if token_axes == "window":
                out = jnp.einsum("bnmhpqPQ,bnPmQhd->bnpmqhd", attn, v)
            else:
                out = jnp.einsum("bnmhpqPQ,bPnQmhd->bpnqmhd", attn, v)
            out = out.reshape(x.shape[:-1] + (self.dim,))
        return nn.Dense(self.dim, use_bias=self.use_bias,
                        dtype=self.dtype, name="proj")(out)


class MLP(nn.Module):
    """Transformer FFN; optional GLU gate (reference: maxvit.py:85-118)."""
    dim: int
    expansion_ratio: int = 4
    act: str = "gelu"
    gated: bool = False
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_act(self.act)
        if self.gated:
            # param-count-preserving inner dim (maxvit.py:102)
            inner = int(self.dim * self.expansion_ratio * 2 / 3 / 32) * 32
            h = nn.Dense(inner * 2, use_bias=self.use_bias, dtype=self.dtype,
                         name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * act(gate)
        else:
            inner = self.dim * self.expansion_ratio
            h = act(nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                             name="proj_in")(x))
        return nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="proj_out")(h)


class PartitionAttention(nn.Module):
    """Pre-norm window/grid attention + FFN with LayerScale
    (reference: maxvit.py:185-270)."""
    dim: int
    partition_size: Tuple[int, int]
    partition_type: str                   # 'window' | 'grid'
    skip_first_norm: bool = False
    dim_head: int = 32
    attention_bias: bool = True
    mlp_ratio: int = 4
    mlp_act: str = "gelu"
    mlp_gated: bool = False
    mlp_bias: bool = True
    ls_init_value: float = 1e-5
    norm_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, tokens: bool = False) -> jnp.ndarray:
        ph, pw = self.partition_size

        def ls(name):
            if self.ls_init_value <= 0:
                return lambda y: y
            gamma = self.param(name, nn.initializers.constant(
                self.ls_init_value), (self.dim,))
            return lambda y: y * gamma.astype(y.dtype)

        attn = SelfAttention(self.dim, self.dim_head, self.attention_bias,
                             dtype=self.dtype, name="attn")
        if tokens:
            # x is ALREADY partitioned [N, T, C] for this block's
            # partition type; the whole block is per-token so no
            # partition/reverse happens here (caller owns the layout)
            shortcut = x
            y = x if self.skip_first_norm else nn.LayerNorm(
                epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
            x = shortcut + ls("ls1")(attn(y))
            y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                             name="norm2")(x)
            y = MLP(self.dim, self.mlp_ratio, self.mlp_act, self.mlp_gated,
                    self.mlp_bias, dtype=self.dtype, name="mlp")(y)
            return x + ls("ls2")(y)

        b, h, w, c = x.shape
        shortcut = x
        y = x if self.skip_first_norm else nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        if _ATTN_6D:
            # free 6-D view; the einsum path materializes no partition
            # transposes (see SelfAttention docstring)
            if self.partition_type == "window":
                t = y.reshape(b, h // ph, ph, w // pw, pw, c)
            else:
                t = y.reshape(b, ph, h // ph, pw, w // pw, c)
            y = attn(t, token_axes=self.partition_type).reshape(b, h, w, c)
        elif self.partition_type == "window":
            t = window_partition(y, ph, pw)
            y = window_reverse(attn(t), ph, pw, h, w)
        else:
            t = grid_partition(y, ph, pw)
            y = grid_reverse(attn(t), ph, pw, h, w)
        x = shortcut + ls("ls1")(y)

        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        y = MLP(self.dim, self.mlp_ratio, self.mlp_act, self.mlp_gated,
                self.mlp_bias, dtype=self.dtype, name="mlp")(y)
        return x + ls("ls2")(y)


class _S2DStemConv(nn.Module):
    """7x7 stride-4 conv with the width-blocks folded into channels.

    Event tensors have ~20 input channels; a direct NHWC conv leaves
    >80% of the TPU's 128 lanes idle on every input load (measured
    0.58 ms/step at Gen1 B=16 — the single hottest op in the model).
    Folding each output column's 4 input columns into the channel dim is
    a PURE RESHAPE (row-major [W, C] -> [W/4, 4*C], no data movement),
    after which the conv has 4*C >= 80 input channels and a 7x2 kernel:
    output col j covers input cols 4j-3..4j+3, i.e. width-blocks j-1 and
    j with in-block tap index 4*bw + s - 1 (the tap at -1 is zero).
    Params identical to nn.Conv: kernel [7, 7, Cin, Cout].

    Accepts THREE input layouts, dispatched on the channel count —
    [B, H, W, Cin] (folds on device; costs a layout copy),
    [B, H, W/4, 4*Cin] (host width-prefold: free numpy reshape), or
    [B, H/4, W/4, 16*Cin] (host both-axis space-to-depth: the H fold is
    a transpose, but the host loader folds it into the copy it already
    makes; the conv becomes a 128-lane-saturating 2x2/stride-1 GEMM).
    All layouts produce bit-identical outputs from the same params
    (tests/test_models.py); host feeders fold via `fold_ev_width` /
    `fold_ev_hw`."""
    dim_out: int
    in_channels: int              # raw event channels (Cin before folding)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = self.in_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.dim_out))
        dt = self.dtype or x.dtype
        if x.shape[-1] == 16 * cin:                 # full S2D [H/4, W/4]
            # output (i,j) covers input rows/cols 4i-3..4i+3: pad one
            # leading zero tap per axis, then taps (s_h, s_w) of block
            # (bh, bw) land at in-channel ((s_h*4)+s_w)*cin + c
            k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k = k.reshape(2, 4, 2, 4, cin, self.dim_out)
            k = k.transpose(0, 2, 1, 3, 4, 5).reshape(
                2, 2, 16 * cin, self.dim_out)
            return jax.lax.conv_general_dilated(
                x.astype(dt), k.astype(dt), (1, 1),
                [(1, 0), (1, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        k = jnp.pad(kernel, ((0, 0), (1, 0), (0, 0), (0, 0)))   # [7,8,ci,co]
        k = k.reshape(7, 2, 4 * cin, self.dim_out)
        if x.shape[-1] == cin:                      # fold on device
            b, h, w, _ = x.shape
            assert w % 4 == 0, w
            x = x.reshape(b, h, w // 4, 4 * cin)
        else:
            assert x.shape[-1] == 4 * cin, (x.shape, cin)
        return jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (4, 1),
            [(3, 3), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fold_ev_width(ev):
    """Host-side width fold [..., H, W, C] -> [..., H, W/4, 4*C] for the
    stride-4 S2D stem (free view on contiguous numpy arrays). Inverse:
    unfold_ev_width."""
    *lead, h, w, c = ev.shape
    assert w % 4 == 0, ev.shape
    return ev.reshape(*lead, h, w // 4, 4 * c)


def unfold_ev_width(ev):
    """[..., H, W/4, 4*C] -> [..., H, W, C]."""
    *lead, h, w4, c4 = ev.shape
    assert c4 % 4 == 0, ev.shape
    return ev.reshape(*lead, h, w4 * 4, c4 // 4)


def fold_ev_hw(ev):
    """Host-side BOTH-axis space-to-depth [..., H, W, C] ->
    [..., H/4, W/4, 16*C] for the stride-4 S2D stem. Unlike the width
    fold this involves a transpose (not a free view) — host loaders fold
    it into the transpose/pad copy they already materialize
    (harvest_frames fold_h). Inverse: unfold_ev_hw."""
    import numpy as _np
    *lead, h, w, c = ev.shape
    assert h % 4 == 0 and w % 4 == 0, ev.shape
    x = ev.reshape(*lead, h // 4, 4, w // 4, 4 * c)
    x = _np.moveaxis(x, -3, -2) if isinstance(ev, _np.ndarray) else \
        jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, h // 4, w // 4, 16 * c)


def unfold_ev_hw(ev):
    """[..., H/4, W/4, 16*C] -> [..., H, W, C]."""
    import numpy as _np
    *lead, h4, w4, c16 = ev.shape
    assert c16 % 16 == 0, ev.shape
    c = c16 // 16
    x = ev.reshape(*lead, h4, w4, 4, 4 * c)
    x = _np.moveaxis(x, -2, -3) if isinstance(ev, _np.ndarray) else \
        jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, h4 * 4, w4 * 4, c)


class ConvDownsample(nn.Module):
    """Overlapped strided patch embed + LayerNorm
    (reference: maxvit.py:143-182). NHWC in and out.

    The factor-4 overlapped stem uses the space-to-depth formulation
    (see _S2DStemConv) with an identical param tree."""
    dim_out: int
    factor: int
    # raw (unfolded) input channels for the factor-4 S2D stem; 0 infers
    # from the input, which is only safe when the input is NOT prefolded
    in_channels: int = 0
    overlap: bool = True
    norm_affine: bool = True
    norm_eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.overlap and self.factor == 4:
            x = _S2DStemConv(self.dim_out,
                             self.in_channels or x.shape[-1],
                             dtype=self.dtype, name="conv")(x)
        else:
            if self.overlap:
                k = (self.factor - 1) * 2 + 1
                pad = k // 2
            else:
                k, pad = self.factor, 0
            x = nn.Conv(self.dim_out, (k, k),
                        strides=(self.factor, self.factor),
                        padding=[(pad, pad), (pad, pad)], use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        return nn.LayerNorm(epsilon=self.norm_eps, use_bias=self.norm_affine,
                            use_scale=self.norm_affine, dtype=self.dtype,
                            name="norm")(x)


# ---------------------------------------------------------------------------
# ConvLSTM
# ---------------------------------------------------------------------------

class _SplitGateConv(nn.Module):
    """1x1 conv over concat(x, h) computed as x@Kx + h@Kh WITHOUT
    materializing the concat (the concat is a full extra HBM pass over
    the biggest tensors in the model; the split matmul is mathematically
    identical). Param tree matches nn.Conv exactly: kernel [1, 1, 2d, 4d],
    bias [4d]."""
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 2 * d, 4 * d))
        bias = self.param("bias", nn.initializers.zeros, (4 * d,))
        k = kernel[0, 0].astype(x.dtype)
        return (x @ k[:d] + h.astype(x.dtype) @ k[d:]
                + bias.astype(x.dtype))


class ConvLSTMCell(nn.Module):
    """1x1-conv LSTM over concat(x, h) (reference: models/layers/rnn.py:37-70).

    Gate layout along channels: [forget, input, output, cell_candidate].
    Optional depthwise 3x3 on the hidden state (identity in RVT configs).
    The gate conv is computed as a concat-free split matmul (same params,
    same math, one less full-tensor HBM pass per step).
    """
    dim: int
    dws_conv: bool = False
    dws_conv_only_hidden: bool = True
    dws_conv_kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 state: Tuple[jnp.ndarray, jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h_prev, c_prev = state
        if self.dws_conv:
            ks = self.dws_conv_kernel_size
            feats = self.dim if self.dws_conv_only_hidden else 2 * self.dim
            dw = nn.Conv(feats, (ks, ks), padding="SAME",
                         feature_group_count=feats, dtype=self.dtype,
                         name="dws")
            if self.dws_conv_only_hidden:
                h_prev = dw(h_prev)
            else:
                xh = dw(jnp.concatenate([x, h_prev], axis=-1))
                x, h_prev = jnp.split(xh, [self.dim], axis=-1)
        mix = _SplitGateConv(self.dim, dtype=self.dtype,
                             name="gates")(x.astype(self.dtype or x.dtype),
                                           h_prev)
        gates, g = jnp.split(mix, [3 * self.dim], axis=-1)
        f, i, o = jnp.split(jax.nn.sigmoid(gates), 3, axis=-1)
        c = f * c_prev + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return h, c


# ---------------------------------------------------------------------------
# YOLO conv blocks (conv + BN + act)
# ---------------------------------------------------------------------------

class ConvBNAct(nn.Module):
    """conv -> BN -> act (reference: network_blocks.py:29-54)."""
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return get_act(self.act)(x)


class DWConvBlock(nn.Module):
    """depthwise 3x3 + pointwise 1x1 (reference: network_blocks.py:57-76)."""
    features: int
    kernel: int
    stride: int = 1
    act: str = "silu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = ConvBNAct(in_ch, self.kernel, self.stride, groups=in_ch,
                      act=self.act, dtype=self.dtype, name="dconv")(x, train)
        return ConvBNAct(self.features, 1, 1, act=self.act,
                         dtype=self.dtype, name="pconv")(x, train)


class Bottleneck(nn.Module):
    """(reference: network_blocks.py:79-101)"""
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        y = ConvBNAct(hidden, 1, act=self.act, dtype=self.dtype,
                      name="conv1")(x, train)
        conv2 = (DWConvBlock if self.depthwise else ConvBNAct)
        y = conv2(self.features, 3, act=self.act, dtype=self.dtype,
                  name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage-partial block (reference: network_blocks.py:104-142)."""
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.features * self.expansion)
        x1 = ConvBNAct(hidden, 1, act=self.act, dtype=self.dtype,
                       name="conv1")(x, train)
        x2 = ConvBNAct(hidden, 1, act=self.act, dtype=self.dtype,
                       name="conv2")(x, train)
        for i in range(self.n):
            x1 = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                            self.act, dtype=self.dtype, name=f"m{i}")(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return ConvBNAct(self.features, 1, act=self.act, dtype=self.dtype,
                         name="conv3")(x, train)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample, NHWC (equals 'nearest-exact' for integer x2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
