"""Numerics parity vs torch (CPU): the same weights must produce the same
outputs through independently-written torch cells that follow the
reference formulas (reference: models/layers/rnn.py:37-70,
maxvit.py:143-182,328-354, network_blocks.py:29-54). Catches silent
mismatches in conv padding, LN epsilon, gate ordering, bias init."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from leod_tpu.models.layers import (ConvBNAct, ConvDownsample, ConvLSTMCell,
                                    SelfAttention)

RTOL, ATOL = 1e-4, 1e-4


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_convlstm_parity():
    rng = np.random.default_rng(0)
    dim, h, w = 8, 6, 10
    x = rng.normal(size=(2, h, w, dim)).astype(np.float32)
    h0 = rng.normal(size=(2, h, w, dim)).astype(np.float32)
    c0 = rng.normal(size=(2, h, w, dim)).astype(np.float32)

    cell = ConvLSTMCell(dim)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          (jnp.asarray(h0), jnp.asarray(c0)))
    kernel = np.asarray(variables["params"]["gates"]["kernel"])  # [1,1,2d,4d]
    bias = np.asarray(variables["params"]["gates"]["bias"])
    h_j, c_j = cell.apply(variables, jnp.asarray(x),
                          (jnp.asarray(h0), jnp.asarray(c0)))

    # torch version per reference rnn.py:51-70 (NCHW)
    conv = torch.nn.Conv2d(2 * dim, 4 * dim, 1)
    with torch.no_grad():
        conv.weight.copy_(_t(kernel[0, 0].T[:, :, None, None]))  # [4d,2d,1,1]
        conv.bias.copy_(_t(bias))
        xh = torch.cat([_t(x).permute(0, 3, 1, 2),
                        _t(h0).permute(0, 3, 1, 2)], dim=1)
        mix = conv(xh)
        gates, g = torch.tensor_split(mix, [3 * dim], dim=1)
        f, i, o = torch.tensor_split(torch.sigmoid(gates), 3, dim=1)
        c_t = f * _t(c0).permute(0, 3, 1, 2) + i * torch.tanh(g)
        h_t = o * torch.tanh(c_t)
    np.testing.assert_allclose(np.asarray(h_j),
                               h_t.permute(0, 2, 3, 1).numpy(), RTOL, ATOL)
    np.testing.assert_allclose(np.asarray(c_j),
                               c_t.permute(0, 2, 3, 1).numpy(), RTOL, ATOL)


def test_self_attention_parity():
    rng = np.random.default_rng(1)
    dim, dim_head, t = 64, 32, 12
    x = rng.normal(size=(3, t, dim)).astype(np.float32)
    attn = SelfAttention(dim, dim_head)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    qkv_k = np.asarray(variables["params"]["qkv"]["kernel"])   # [d, 3d]
    qkv_b = np.asarray(variables["params"]["qkv"]["bias"])
    proj_k = np.asarray(variables["params"]["proj"]["kernel"])
    proj_b = np.asarray(variables["params"]["proj"]["bias"])
    out_j = attn.apply(variables, jnp.asarray(x))

    # torch per reference maxvit.py:343-354: qkv packed as
    # [heads, 3*dim_head] per token, i.e. reshape(B,-1,H,3*dh)
    with torch.no_grad():
        xt = _t(x)
        qkv = xt @ _t(qkv_k) + _t(qkv_b)                       # [B,T,3d]
        nh = dim // dim_head
        q, k, v = qkv.view(3, t, nh, 3 * dim_head).transpose(1, 2).chunk(
            3, dim=3)
        a = (q @ k.transpose(-2, -1)) * dim_head ** -0.5
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(3, t, dim)
        o = o @ _t(proj_k) + _t(proj_b)
    np.testing.assert_allclose(np.asarray(out_j), o.numpy(), RTOL, ATOL)


def test_conv_bn_act_parity():
    rng = np.random.default_rng(2)
    cin, cout, h, w = 8, 16, 10, 12
    x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
    blk = ConvBNAct(cout, 3, 1)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_j = blk.apply(variables, jnp.asarray(x))   # eval mode (running stats)

    k = np.asarray(variables["params"]["conv"]["kernel"])      # [3,3,in,out]
    with torch.no_grad():
        conv = torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        conv.weight.copy_(_t(k.transpose(3, 2, 0, 1)))
        bn = torch.nn.BatchNorm2d(cout, eps=1e-5).eval()
        bn.weight.copy_(_t(np.asarray(variables["params"]["bn"]["scale"])))
        bn.bias.copy_(_t(np.asarray(variables["params"]["bn"]["bias"])))
        bn.running_mean.copy_(_t(np.asarray(
            variables["batch_stats"]["bn"]["mean"])))
        bn.running_var.copy_(_t(np.asarray(
            variables["batch_stats"]["bn"]["var"])))
        o = torch.nn.functional.silu(bn(conv(_t(x).permute(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(out_j),
                               o.permute(0, 2, 3, 1).numpy(), RTOL, ATOL)


def test_conv_downsample_parity():
    rng = np.random.default_rng(3)
    cin, cout, h, w = 20, 32, 16, 24
    factor = 4
    x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
    blk = ConvDownsample(cout, factor)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_j = blk.apply(variables, jnp.asarray(x))

    k = np.asarray(variables["params"]["conv"]["kernel"])      # [7,7,in,out]
    ln_s = np.asarray(variables["params"]["norm"]["scale"])
    ln_b = np.asarray(variables["params"]["norm"]["bias"])
    with torch.no_grad():
        # reference maxvit.py:160-178: k = (f-1)*2+1, pad k//2, stride f
        conv = torch.nn.Conv2d(cin, cout, 7, stride=factor, padding=3,
                               bias=False)
        conv.weight.copy_(_t(k.transpose(3, 2, 0, 1)))
        y = conv(_t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        y = torch.nn.functional.layer_norm(y, (cout,), _t(ln_s), _t(ln_b),
                                           eps=1e-5)
    np.testing.assert_allclose(np.asarray(out_j), y.numpy(), RTOL, ATOL)
