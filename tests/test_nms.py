import numpy as np
import jax.numpy as jnp

from leod_tpu.ops.nms import (batched_nms_numpy, nms_mask, nms_numpy,
                              postprocess)


def _random_boxes(rng, n, hw=(240, 304)):
    cx = rng.uniform(10, hw[1] - 10, n)
    cy = rng.uniform(10, hw[0] - 10, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def test_nms_mask_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(3):
        n = 64
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores)
        b_sorted = boxes[order].astype(np.float32)
        s_sorted = scores[order]
        keep = np.asarray(nms_mask(jnp.asarray(b_sorted),
                                   0.45, jnp.ones(n, bool)))
        kept_jax = set(order[np.where(keep)[0]].tolist())
        kept_np = set(nms_numpy(boxes, scores, 0.45).tolist())
        assert kept_jax == kept_np


def test_nms_suppresses_duplicates():
    boxes = jnp.asarray(np.array([
        [10, 10, 50, 50],
        [12, 12, 52, 52],   # heavy overlap -> suppressed
        [100, 100, 140, 140],
    ], np.float32))
    keep = np.asarray(nms_mask(boxes, 0.45, jnp.ones(3, bool)))
    np.testing.assert_array_equal(keep, [True, False, True])
    # same boxes, different classes: cross-class suppression masked off
    cls = jnp.asarray(np.array([0, 1, 0], np.float32))
    keep = np.asarray(nms_mask(boxes, 0.45, jnp.ones(3, bool), cls))
    np.testing.assert_array_equal(keep, [True, True, True])


def test_postprocess_shapes_and_classes():
    rng = np.random.default_rng(1)
    B, A, C = 2, 128, 3
    preds = np.zeros((B, A, 5 + C), np.float32)
    cx = rng.uniform(20, 280, (B, A))
    cy = rng.uniform(20, 220, (B, A))
    preds[..., 0], preds[..., 1] = cx, cy
    preds[..., 2] = rng.uniform(10, 40, (B, A))
    preds[..., 3] = rng.uniform(10, 40, (B, A))
    preds[..., 4] = rng.uniform(0, 1, (B, A))
    preds[..., 5:] = rng.uniform(0, 1, (B, A, C))
    dets, valid = postprocess(jnp.asarray(preds), num_classes=C,
                              conf_threshold=0.3, nms_threshold=0.45,
                              pre_topk=128, max_dets=128)
    dets, valid = np.asarray(dets), np.asarray(valid)
    assert dets.shape == (B, 128, 7) and valid.shape == (B, 128)
    for b in range(B):
        n = valid[b].sum()
        # valid rows are front-packed, score-sorted
        assert valid[b, :n].all() and not valid[b, n:].any()
        sc = dets[b, :n, 4] * dets[b, :n, 5]
        assert np.all(sc >= 0.3 - 1e-6)
        assert np.all(np.diff(sc) <= 1e-5)
        # agreement with the host batched NMS on the same candidate set
        mask = (preds[b, :, 4] * preds[b, :, 5:].max(-1)) >= 0.3
        cand = preds[b][mask]
        boxes = np.stack([cand[:, 0] - cand[:, 2] / 2, cand[:, 1] - cand[:, 3] / 2,
                          cand[:, 0] + cand[:, 2] / 2, cand[:, 1] + cand[:, 3] / 2], -1)
        ref_keep = batched_nms_numpy(boxes, cand[:, 4] * cand[:, 5:].max(-1),
                                     cand[:, 5:].argmax(-1), 0.45)
        assert n == len(ref_keep)


def test_postprocess_empty():
    preds = np.zeros((1, 16, 7), np.float32)
    dets, valid = postprocess(jnp.asarray(preds), num_classes=2,
                              conf_threshold=0.3, pre_topk=16, max_dets=8)
    assert not np.asarray(valid).any()
