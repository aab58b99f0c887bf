"""Model stack: shapes, recurrence, jit-ability, loss behavior."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leod_tpu.config import (BackboneConfig, HeadConfig, ModelConfig,
                             experiment_preset)
from leod_tpu.models.backbone import init_states, reset_states
from leod_tpu.models.detector import Detector
from leod_tpu.models.head import make_anchors
from leod_tpu.models.layers import (grid_partition, grid_reverse,
                                    window_partition, window_reverse)

# small config for fast CPU compiles: 64x96 input, embed 32
IN_RES = (64, 96)


def _tiny_cfg():
    return ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=IN_RES,
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2))


def test_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 8)).astype(np.float32))
    w = window_partition(x, 8, 10)
    assert w.shape == (2 * 2 * 2, 80, 8)
    np.testing.assert_array_equal(window_reverse(w, 8, 10, 16, 20), x)
    g = grid_partition(x, 8, 10)
    assert g.shape == (2 * 2 * 2, 80, 8)
    np.testing.assert_array_equal(grid_reverse(g, 8, 10, 16, 20), x)


def test_grid_vs_window_differ():
    x = jnp.arange(2 * 16 * 20 * 1, dtype=jnp.float32).reshape(1, 16, 20, 2 * 1)
    w = window_partition(x, 8, 10)
    g = grid_partition(x, 8, 10)
    assert not np.array_equal(np.asarray(w), np.asarray(g))


def test_anchor_grid():
    a = make_anchors((256, 320), (8, 16, 32))
    n = (32 * 40) + (16 * 20) + (8 * 10)
    assert a.centers.shape == (n, 2)
    assert float(a.centers[0, 0]) == 4.0 and float(a.strides[0]) == 8.0
    assert float(a.strides[-1]) == 32.0
    # last anchor of first level
    assert float(a.centers[32 * 40 - 1, 0]) == (39 + 0.5) * 8


@pytest.fixture(scope="module")
def det_and_vars():
    det = Detector(_tiny_cfg(), dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=2)
    return det, variables


def test_backbone_shapes_and_recurrence(det_and_vars):
    det, variables = det_and_vars
    x = jnp.ones((2, 64, 96, 20), jnp.float32)
    states = det.init_states(2, jnp.float32)
    feats, new_states = jax.jit(det.forward_backbone)(variables, x, states)
    assert feats[1].shape == (2, 16, 24, 32)
    assert feats[2].shape == (2, 8, 12, 64)
    assert feats[3].shape == (2, 4, 6, 128)
    assert feats[4].shape == (2, 2, 3, 256)
    # second step with carried state differs from a fresh-state step
    feats2, _ = jax.jit(det.forward_backbone)(variables, x, new_states)
    assert not np.allclose(np.asarray(feats2[4]), np.asarray(feats[4]),
                           atol=1e-5)
    # reset restores the fresh-state output
    reset = reset_states(new_states, jnp.array([True, True]))
    feats3, _ = jax.jit(det.forward_backbone)(variables, x, reset)
    np.testing.assert_allclose(np.asarray(feats3[4]), np.asarray(feats[4]),
                               atol=1e-5)


def test_partial_reset(det_and_vars):
    det, variables = det_and_vars
    states = det.init_states(2, jnp.float32)
    x = jnp.ones((2, 64, 96, 20), jnp.float32)
    _, st = det.forward_backbone(variables, x, states)
    st_r = reset_states(st, jnp.array([True, False]))
    h = np.asarray(st_r[0][0])
    assert np.all(h[0] == 0) and not np.all(h[1] == 0)


def test_detect_and_loss(det_and_vars):
    det, variables = det_and_vars
    x = jnp.ones((2, 64, 96, 20), jnp.float32)
    states = det.init_states(2, jnp.float32)
    feats, _ = det.forward_backbone(variables, x, states)
    preds, _ = det.forward_detect(variables, feats, train=False)
    A = 8 * 12 + 4 * 6 + 2 * 3
    assert preds.shape == (2, A, 5 + 2)
    p = np.asarray(preds)
    assert np.all(p[..., 4:] >= 0) and np.all(p[..., 4:] <= 1)  # sigmoided
    assert np.all(p[..., 2:4] > 0)                              # exp(wh) > 0

    # train path: logits + loss
    train_out, new_stats = det.forward_detect(variables, feats, train=True)
    assert new_stats is not None
    labels = np.zeros((2, 8, 7), np.float32)
    labels[0, 0] = [0, 40, 30, 24, 20, 1, 1]
    labels[1, 0] = [1, 70, 40, 18, 22, 1, 1]
    losses = det.loss(train_out, jnp.asarray(labels),
                      jnp.asarray([True, True]))
    for k in ("loss", "iou_loss", "conf_loss", "cls_loss", "num_fg"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["num_fg"]) > 0

    # masked-out frame contributes nothing
    losses_masked = det.loss(train_out, jnp.asarray(labels),
                             jnp.asarray([True, False]))
    assert float(losses_masked["loss"]) != float(losses["loss"])


def test_loss_gradients_finite(det_and_vars):
    det, variables = det_and_vars
    labels = np.zeros((2, 4, 7), np.float32)
    labels[0, 0] = [0, 40, 30, 24, 20, 1, 1]
    labels = jnp.asarray(labels)
    fm = jnp.asarray([True, True])
    x = jnp.ones((2, 64, 96, 20), jnp.float32)
    states = det.init_states(2, jnp.float32)

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        feats, _ = det.forward_backbone(v, x, states)
        out, _ = det.forward_detect(v, feats, train=True)
        return det.loss(out, labels, fm)["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # gradient flows into the backbone too (through the feature path)
    g_bb = jax.tree.leaves(grads["backbone"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in g_bb)


def test_prebatch_stage1_equivalence(det_and_vars):
    """The pre-batched stage-1 scan must match the plain per-step scan."""
    from leod_tpu.train.step import _scan_backbone
    det, variables = det_and_vars
    rng = np.random.default_rng(7)
    ev = jnp.asarray(rng.integers(0, 40, (3, 2, 64, 96, 20)).astype(np.uint8))
    states = det.init_states(2, jnp.float32)
    s_a, f_a = jax.jit(lambda v, e, s: _scan_backbone(
        det, v, s, e, prebatch_stage1=False))(variables, ev, states)
    s_b, f_b = jax.jit(lambda v, e, s: _scan_backbone(
        det, v, s, e, prebatch_stage1=True))(variables, ev, states)
    for k in f_a:
        np.testing.assert_allclose(np.asarray(f_a[k]), np.asarray(f_b[k]),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_stem_folded_input_equivalence(det_and_vars):
    """The S2D stem accepts host-prefolded input [B, H, W/4, 4C]
    (config.stem_width_fold / loader.harvest_frames fold_w) and must
    produce bit-identical features to the unfolded [B, H, W, C] path —
    the fold is the same reshape, moved off-device."""
    from leod_tpu.models.layers import fold_ev_width, unfold_ev_width

    det, variables = det_and_vars
    rng = np.random.default_rng(3)
    x = rng.integers(0, 50, (2, 64, 96, 20)).astype(np.float32)
    states = det.init_states(2, jnp.float32)

    f_plain, _ = det.forward_backbone(variables, jnp.asarray(x), states)
    folded = fold_ev_width(x)
    assert folded.shape == (2, 64, 24, 80)
    np.testing.assert_array_equal(unfold_ev_width(folded), x)
    f_fold, _ = det.forward_backbone(variables, jnp.asarray(folded), states)
    for s in f_plain:
        np.testing.assert_array_equal(np.asarray(f_plain[s]),
                                      np.asarray(f_fold[s]))

    # both-axis space-to-depth [B, H/4, W/4, 16C] (config.stem_fold_hw /
    # harvest_frames fold_hw): numerically equal (the 2x2 stride-1 conv
    # sums taps in a different order, so equality is to fp tolerance)
    from leod_tpu.models.layers import fold_ev_hw, unfold_ev_hw
    folded_hw = fold_ev_hw(x)
    assert folded_hw.shape == (2, 16, 24, 320)
    np.testing.assert_array_equal(unfold_ev_hw(folded_hw), x)
    f_hw, _ = det.forward_backbone(variables, jnp.asarray(folded_hw), states)
    for s in f_plain:
        np.testing.assert_allclose(np.asarray(f_plain[s]),
                                   np.asarray(f_hw[s]),
                                   rtol=1e-4, atol=1e-4)


def test_harvest_fold_hw_layout():
    """harvest_frames fold_hw ships exactly fold_ev_hw of the padded
    NHWC tensor."""
    from leod_tpu.data.loader import harvest_frames
    from leod_tpu.models.layers import fold_ev_hw

    rng = np.random.default_rng(0)
    L, B = 3, 2
    ev = rng.integers(0, 50, (L, B, 20, 30, 40), dtype=np.int64).astype(
        np.uint8)                                     # [L, B, C, H, W]
    batch = {"ev": ev, "is_first": np.zeros(B, bool),
             "labels": [[None] * B for _ in range(L)]}
    plain = harvest_frames(batch, 2, 4, (32, 40))
    folded = harvest_frames(batch, 2, 4, (32, 40), fold_hw=(4, 4))
    want = fold_ev_hw(plain["ev"])
    assert folded["ev"].shape == (L, B, 8, 10, 320)
    np.testing.assert_array_equal(folded["ev"], want)


def test_reset_states_clears_nonfinite():
    """reset_states must clear NaN/Inf-poisoned slots (selection, not
    multiplication: 0 * NaN == NaN would keep the slot dead forever)."""
    states = ((jnp.zeros((8, 4, 4, 3)), jnp.zeros((8, 4, 4, 3))),)
    poisoned = jax.tree.map(
        lambda s: s.at[0].set(jnp.nan).at[1].set(jnp.inf), states)
    out = reset_states(poisoned, jnp.array([True, True, False] + [False] * 5))
    h = out[0][0]
    assert bool(jnp.isfinite(h[:2]).all())       # poisoned rows cleared
    assert bool(jnp.isfinite(h).all())
