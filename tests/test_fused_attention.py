"""Fused Pallas MaxViT block pair vs the flax modules: identical outputs
with shared weights (interpret mode on CPU; the compiled kernel is
exercised on the real chip by the bench/eval drives)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leod_tpu.models.layers import PartitionAttention
from leod_tpu.ops.maxvit_pallas import fused_block_pair

H, W, C = 16, 20, 64
PH, PW = 4, 5


def _pair(skip_norm, gated=False, dim=C):
    wblk = PartitionAttention(dim, (PH, PW), "window",
                              skip_first_norm=skip_norm, mlp_gated=gated)
    gblk = PartitionAttention(dim, (PH, PW), "grid", skip_first_norm=False,
                              mlp_gated=gated)
    return wblk, gblk


@pytest.mark.parametrize("skip_norm", [False, True])
@pytest.mark.parametrize("gated", [False, True])
def test_fused_pair_matches_flax(skip_norm, gated):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)).astype(np.float32))
    wblk, gblk = _pair(skip_norm, gated)
    wv = wblk.init(jax.random.PRNGKey(0), x)
    gv = gblk.init(jax.random.PRNGKey(1), x)
    ref = gblk.apply(gv, wblk.apply(wv, x))
    got = fused_block_pair(x, wv["params"], gv["params"], (PH, PW),
                           skip_first_norm=skip_norm, gated=gated,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_pair_multihead_and_single_head():
    rng = np.random.default_rng(1)
    for dim in (32, 128):       # 1 head and 4 heads
        x = jnp.asarray(rng.normal(size=(1, H, W, dim)).astype(np.float32))
        wblk, gblk = _pair(True, dim=dim)
        wv = wblk.init(jax.random.PRNGKey(0), x)
        gv = gblk.init(jax.random.PRNGKey(1), x)
        ref = gblk.apply(gv, wblk.apply(wv, x))
        got = fused_block_pair(x, wv["params"], gv["params"], (PH, PW),
                               skip_first_norm=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_stage_matches_flax_backbone():
    """Whole-stage kernel (pairs + ConvLSTM, ops/maxvit_pallas.py
    fused_stage): identical stage features and (h, c) states vs the flax
    path, from warm (non-zero) states. MEASURED NEGATIVE end-to-end on
    v5e (5,096-5,354 vs 5,810 frames/s XLA — docs/benchmarks.md), kept
    available + parity-pinned like the pair kernel."""
    import leod_tpu.ops.maxvit_pallas as mp
    from leod_tpu.config import BackboneConfig
    from leod_tpu.models.backbone import RVTBackbone, init_states

    cfg = BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                         partition_size=(2, 3))
    bb = RVTBackbone(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 20)).astype(np.float32) * 3)
    states = init_states(cfg, 2, jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x, states)
    _, warm = bb.apply(v, x, states)                  # non-zero states

    orig = mp.fused_stage
    mp.fused_stage = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        f_fused, st_fused = bb.apply(v, x, warm, fused="stage")
    finally:
        mp.fused_stage = orig
    f_ref, st_ref = bb.apply(v, x, warm)
    for s in f_ref:
        np.testing.assert_allclose(np.asarray(f_fused[s]),
                                   np.asarray(f_ref[s]),
                                   rtol=2e-5, atol=2e-5, err_msg=str(s))
    for (h1, c1), (h2, c2) in zip(st_fused, st_ref):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=2e-5, atol=2e-5)


def test_attention_tokens_mode_matches_default():
    """Token-layout-persistent block pairs (LEOD_ATTN_TOKENS,
    layers.py/backbone.py): the whole block runs in partitioned [N,T,C]
    with one window->grid relayout per pair. Every reordered op is
    per-token, so the full backbone (features AND LSTM states) must
    match the default path exactly."""
    import leod_tpu.models.layers as ly
    from leod_tpu.config import BackboneConfig
    from leod_tpu.models.backbone import RVTBackbone, init_states

    cfg = BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                         partition_size=(2, 3))
    bb = RVTBackbone(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 20)).astype(np.float32) * 3)
    states = init_states(cfg, 2, jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x, states)
    old = ly._ATTN_TOKENS
    try:
        # pin both sides explicitly: the token path is the DEFAULT now,
        # so the classic per-block partition path is the one that needs
        # forcing for the reference side
        ly._ATTN_TOKENS = False
        f_ref, st_ref = bb.apply(v, x, states)
        ly._ATTN_TOKENS = True
        f_tok, st_tok = bb.apply(v, x, states)
    finally:
        ly._ATTN_TOKENS = old
    for s in f_ref:
        np.testing.assert_allclose(np.asarray(f_tok[s]),
                                   np.asarray(f_ref[s]),
                                   rtol=1e-6, atol=1e-6, err_msg=str(s))
    for (h1, c1), (h2, c2) in zip(st_tok, st_ref):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                                   rtol=1e-6, atol=1e-6)


def test_attention_6d_einsum_matches_partition():
    """The 6-D einsum attention form (SelfAttention token_axes) is
    numerically identical to the explicit-partition path. MEASURED
    NEGATIVE on v5e (1,371 vs 5,810 frames/s — XLA tiles the 8-D
    einsums off the MXU); kept as a pinned-parity probe."""
    import leod_tpu.models.layers as ly

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 32)).astype(np.float32))
    for ptype in ("window", "grid"):
        m = ly.PartitionAttention(32, (4, 5), ptype, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y0 = m.apply(v, x)
        old = ly._ATTN_6D
        ly._ATTN_6D = True
        try:
            y1 = m.apply(v, x)
        finally:
            ly._ATTN_6D = old
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-6, atol=1e-6, err_msg=ptype)
