"""Fused MaxViT attention block pair as a Pallas TPU kernel.

A MaxViT block pair (reference: maxvit_rnn.py:119-141 — window
PartitionAttention then grid PartitionAttention, each pre-norm ->
partition -> MHSA -> proj -> LayerScale -> residual -> pre-norm -> MLP
-> LayerScale -> residual; maxvit.py:185-270) is ~20 separate XLA
kernels, each a full HBM pass over the stage-1 tensor ([B, 64, 80, 64]
at Gen1). Per-op they already run near HBM bandwidth, so the remaining
lever is fusion: this kernel grids over the batch and keeps one image's
feature map plus both blocks' weights resident in VMEM, reading x once
and writing the pair output once. Measured marginal cost at Gen1
stage 1 (B=16): 1.37 ms (XLA) -> ~0.95 ms.

Forward-only (inference/eval/self-training prediction paths); training
keeps the XLA path. Numerical parity with the flax modules is pinned by
tests/test_fused_attention.py (interpret mode) and checked on-chip by
the bench/eval drives.

Mosaic constraints respected here: never reshape across the minormost
(lane) dim — heads are SLICED from the 2-D qkv; only sublane dims are
split/merged by reshape.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block parameter slots (order matters; vectors are shipped as [1, N])
_SLOTS = ("ln1_s", "ln1_b", "qkv_k", "qkv_b", "proj_k", "proj_b", "ls1",
          "ln2_s", "ln2_b", "min_k", "min_b", "mout_k", "mout_b", "ls2")


def _layernorm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _apply_block(x, p, *, kind, ph, pw, dim_head, skip_first_norm, act,
                 gated, has_ls, eps):
    """One PartitionAttention block on a single image [H, W, C] held in
    VMEM. `p` maps _SLOTS names to refs."""
    h, w, c = x.shape
    t = ph * pw
    nh, nw = h // ph, w // pw
    n_win = nh * nw
    heads = c // dim_head
    dt = x.dtype

    def dense(v, k_ref, b_ref):
        y = jax.lax.dot_general(v, k_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref[0].astype(jnp.float32)).astype(dt)

    # ---- attention sub-block -------------------------------------------
    y = x if skip_first_norm else _layernorm(
        x, p["ln1_s"][0], p["ln1_b"][0], eps).astype(dt)
    if kind == "window":
        tok = (y.reshape(nh, ph, nw, pw, c)
               .transpose(0, 2, 1, 3, 4).reshape(n_win * t, c))
    else:      # grid: partition size indexes the OUTER (strided) dims
        tok = (y.reshape(ph, nh, pw, nw, c)
               .transpose(1, 3, 0, 2, 4).reshape(n_win * t, c))

    qkv = dense(tok, p["qkv_k"], p["qkv_b"])               # [n*t, 3C]
    outs = []
    scale = dim_head ** -0.5
    for hd in range(heads):
        # head-major packing: channel = head*3*dh + {q, k, v}*dh
        base = hd * 3 * dim_head
        q = qkv[:, base:base + dim_head].reshape(n_win, t, dim_head)
        k = qkv[:, base + dim_head:base + 2 * dim_head
                ].reshape(n_win, t, dim_head)
        v = qkv[:, base + 2 * dim_head:base + 3 * dim_head
                ].reshape(n_win, t, dim_head)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale     # [n_win, t, t]
        prob = jax.nn.softmax(logits, axis=-1).astype(dt)
        o = jax.lax.dot_general(
            prob, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
        outs.append(o.reshape(n_win * t, dim_head))
    attn = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)
    attn = dense(attn, p["proj_k"], p["proj_b"])
    attn = attn.reshape(nh, nw, ph, pw, c)
    if kind == "window":
        y = attn.transpose(0, 2, 1, 3, 4).reshape(h, w, c)
    else:
        y = attn.transpose(2, 0, 3, 1, 4).reshape(h, w, c)
    if has_ls:
        y = y * p["ls1"][0].astype(dt)
    x = x + y

    # ---- MLP sub-block --------------------------------------------------
    y = _layernorm(x, p["ln2_s"][0], p["ln2_b"][0], eps).astype(dt)
    act_fn = {"gelu": jax.nn.gelu, "silu": jax.nn.silu,
              "relu": jax.nn.relu}[act]
    hdn = jax.lax.dot_general(
        y.reshape(h * w, c), p["min_k"][:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + p["min_b"][0].astype(jnp.float32)
    if gated:
        half = hdn.shape[-1] // 2
        hdn = hdn[:, :half] * act_fn(hdn[:, half:])
    else:
        hdn = act_fn(hdn)
    y = dense(hdn.astype(dt), p["mout_k"], p["mout_b"]).reshape(h, w, c)
    if has_ls:
        y = y * p["ls2"][0].astype(dt)
    return x + y


def _pack_block_args(params: dict, c: int, skip_first_norm: bool):
    """Flatten a PartitionAttention param subtree into the _SLOTS order."""
    has_ls = "ls1" in params
    zero2 = jnp.zeros((1, c), jnp.float32)

    def vec(v):
        return jnp.asarray(v).reshape(1, -1)

    def bias(sub):
        if "bias" in sub:
            return vec(sub["bias"])
        return jnp.zeros((1, sub["kernel"].shape[-1]), jnp.float32)

    return [
        zero2 if skip_first_norm else vec(params["norm1"]["scale"]),
        zero2 if skip_first_norm else vec(params["norm1"]["bias"]),
        params["attn"]["qkv"]["kernel"], bias(params["attn"]["qkv"]),
        params["attn"]["proj"]["kernel"], bias(params["attn"]["proj"]),
        vec(params["ls1"]) if has_ls else zero2,
        vec(params["norm2"]["scale"]), vec(params["norm2"]["bias"]),
        params["mlp"]["proj_in"]["kernel"], bias(params["mlp"]["proj_in"]),
        params["mlp"]["proj_out"]["kernel"], bias(params["mlp"]["proj_out"]),
        vec(params["ls2"]) if has_ls else zero2,
    ], has_ls


def _pair_kernel(x_ref, *refs, ph, pw, dim_head, skip_first_norm, act,
                 gated, has_ls, eps):
    n = len(_SLOTS)
    wrefs = dict(zip(_SLOTS, refs[:n]))
    grefs = dict(zip(_SLOTS, refs[n:2 * n]))
    out_ref = refs[2 * n]
    x = x_ref[0]
    x = _apply_block(x, wrefs, kind="window", ph=ph, pw=pw,
                     dim_head=dim_head, skip_first_norm=skip_first_norm,
                     act=act, gated=gated, has_ls=has_ls, eps=eps)
    x = _apply_block(x, grefs, kind="grid", ph=ph, pw=pw,
                     dim_head=dim_head, skip_first_norm=False,
                     act=act, gated=gated, has_ls=has_ls, eps=eps)
    out_ref[0] = x


def _lstm_update(x, h_prev, c_prev, kx_ref, kh_ref, b_ref):
    """Concat-free ConvLSTM gate update on one image [H, W, C] in VMEM
    (models/layers.py ConvLSTMCell, dws_conv=False). Gate layout along
    channels: [forget, input, output, cell_candidate]."""
    hh, ww, c = x.shape
    xf = x.reshape(hh * ww, c)
    hf = h_prev.reshape(hh * ww, c).astype(x.dtype)
    mix = (jax.lax.dot_general(xf, kx_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(hf, kh_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
           + b_ref[0].astype(jnp.float32))
    f = jax.nn.sigmoid(mix[:, :c])
    i = jax.nn.sigmoid(mix[:, c:2 * c])
    o = jax.nn.sigmoid(mix[:, 2 * c:3 * c])
    g = jnp.tanh(mix[:, 3 * c:])
    cn = f * c_prev.reshape(hh * ww, c).astype(jnp.float32) + i * g
    hn = o * jnp.tanh(cn)
    return (hn.astype(x.dtype).reshape(hh, ww, c),
            cn.astype(c_prev.dtype).reshape(hh, ww, c))


def _stage_kernel(x_ref, h_ref, c_ref, *refs, n_pairs, ph, pw, dim_head,
                  skip_first_norm, act, gated, has_ls, eps):
    n = len(_SLOTS)
    out_h, out_c = refs[-2], refs[-1]
    x = x_ref[0]
    for i in range(n_pairs):
        wrefs = dict(zip(_SLOTS, refs[2 * i * n:(2 * i + 1) * n]))
        grefs = dict(zip(_SLOTS, refs[(2 * i + 1) * n:(2 * i + 2) * n]))
        x = _apply_block(x, wrefs, kind="window", ph=ph, pw=pw,
                         dim_head=dim_head,
                         skip_first_norm=skip_first_norm and i == 0,
                         act=act, gated=gated, has_ls=has_ls, eps=eps)
        x = _apply_block(x, grefs, kind="grid", ph=ph, pw=pw,
                         dim_head=dim_head, skip_first_norm=False,
                         act=act, gated=gated, has_ls=has_ls, eps=eps)
    kx_ref, kh_ref, b_ref = refs[2 * n_pairs * n:2 * n_pairs * n + 3]
    hn, cn = _lstm_update(x, h_ref[0], c_ref[0], kx_ref, kh_ref, b_ref)
    out_h[0] = hn
    out_c[0] = cn


def fused_stage(x: jnp.ndarray, h_prev: jnp.ndarray, c_prev: jnp.ndarray,
                block_params: list, lstm_params: dict,
                partition_size: Tuple[int, int], skip_first_norm: bool,
                dim_head: int = 32, act: str = "gelu", gated: bool = False,
                eps: float = 1e-5, interpret: bool = False):
    """One WHOLE backbone stage minus the downsample conv — all
    attention block pairs AND the ConvLSTM — in a single kernel, gridded
    over batch (VERDICT r2 item 5b probe). The pair-only kernel loses
    end-to-end because the pallas_call splits a stage in half for XLA's
    scheduler; here the barrier lands on the stage boundary instead.

    x/h_prev/c_prev: [B, H, W, C]; block_params: [(window_tree,
    grid_tree), ...]; lstm_params: the ConvLSTMCell 'gates' subtree
    (kernel [1, 1, 2C, 4C], bias [4C] — dws_conv unsupported).
    Returns (h_new, c_new); the stage feature output IS h_new."""
    b, hh, ww, c = x.shape
    ph, pw = partition_size
    assert hh % ph == 0 and ww % pw == 0, (hh, ww, ph, pw)
    args = []
    has_ls = None
    for i, (wp, gp) in enumerate(block_params):
        wargs, wls = _pack_block_args(wp, c, skip_first_norm and i == 0)
        gargs, gls = _pack_block_args(gp, c, False)
        assert wls == gls and (has_ls is None or has_ls == wls)
        has_ls = wls
        args += wargs + gargs
    gk = jnp.asarray(lstm_params["kernel"])[0, 0]            # [2C, 4C]
    args += [gk[:c], gk[c:], jnp.asarray(lstm_params["bias"]).reshape(1, -1)]

    kernel = functools.partial(
        _stage_kernel, n_pairs=len(block_params), ph=ph, pw=pw,
        dim_head=dim_head, skip_first_norm=skip_first_norm, act=act,
        gated=gated, has_ls=has_ls, eps=eps)
    img = pl.BlockSpec((1, hh, ww, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[img, img, img] + [w_spec] * len(args),
        out_specs=(img, img),
        out_shape=(out_shape,
                   jax.ShapeDtypeStruct((b, hh, ww, c), c_prev.dtype)),
        interpret=interpret,
    )(x, h_prev, c_prev, *args)


def fused_block_pair(x: jnp.ndarray, window_params: dict, grid_params: dict,
                     partition_size: Tuple[int, int],
                     skip_first_norm: bool, dim_head: int = 32,
                     act: str = "gelu", gated: bool = False,
                     eps: float = 1e-5,
                     interpret: bool = False) -> jnp.ndarray:
    """Window block then grid block in one kernel, gridded over batch.

    x: [B, H, W, C]; *_params: flax param subtrees of the two
    PartitionAttention modules (models/layers.py)."""
    b, h, w, c = x.shape
    ph, pw = partition_size
    assert h % ph == 0 and w % pw == 0, (h, w, ph, pw)
    wargs, has_ls = _pack_block_args(window_params, c, skip_first_norm)
    gargs, has_ls_g = _pack_block_args(grid_params, c, False)
    assert has_ls == has_ls_g

    kernel = functools.partial(
        _pair_kernel, ph=ph, pw=pw, dim_head=dim_head,
        skip_first_norm=skip_first_norm, act=act, gated=gated,
        has_ls=has_ls, eps=eps)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [w_spec] * (2 * len(_SLOTS)),
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, *wargs, *gargs)
