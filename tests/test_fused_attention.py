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
