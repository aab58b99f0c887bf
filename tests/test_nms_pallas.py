"""Pallas NMS kernel vs host/XLA references (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from leod_tpu.ops.nms import nms_numpy
from leod_tpu.ops.nms_pallas import nms_mask_pallas


def test_pallas_nms_matches_numpy():
    rng = np.random.default_rng(0)
    for trial in range(3):
        n = 150
        cx = rng.uniform(10, 290, n)
        cy = rng.uniform(10, 230, n)
        w = rng.uniform(5, 60, n)
        h = rng.uniform(5, 60, n)
        boxes = np.stack([cx - w / 2, cy - h / 2,
                          cx + w / 2, cy + h / 2], -1).astype(np.float32)
        scores = rng.uniform(0.1, 1, n).astype(np.float32)
        order = np.argsort(-scores)
        keep = np.asarray(nms_mask_pallas(
            jnp.asarray(boxes[order]), 0.45, jnp.ones(n, bool),
            interpret=True))
        got = set(order[np.where(keep)[0]].tolist())
        want = set(nms_numpy(boxes, scores, 0.45).tolist())
        assert got == want


def test_pallas_nms_respects_valid_mask():
    boxes = np.array([[10, 10, 50, 50], [100, 100, 140, 140]], np.float32)
    valid = np.array([True, False])
    keep = np.asarray(nms_mask_pallas(jnp.asarray(boxes), 0.45,
                                      jnp.asarray(valid), interpret=True))
    np.testing.assert_array_equal(keep, [True, False])
