"""Native COCO matching kernel vs the pure-numpy fallback: identical
outputs on randomized inputs (both orderings of the greedy match must
agree because they implement the same pycocotools semantics)."""
import numpy as np
import pytest

import leod_tpu.native as native
from leod_tpu.eval.coco import (AREA_RANGES, IOU_THRS, COCOEvaluator,
                                _evaluate_image_all_areas)


def _random_case(rng, d, g):
    gt = np.abs(rng.normal(30, 40, (g, 4))) + 1
    gt[:, :2] = rng.uniform(0, 200, (g, 2))
    dt = gt[rng.integers(0, g, d)] + rng.normal(0, 6, (d, 4)) if g else \
        rng.uniform(1, 100, (d, 4))
    dt[:, 2:] = np.abs(dt[:, 2:]) + 1
    scores = rng.uniform(0, 1, d)
    gti = rng.uniform(size=g) < 0.2
    return gt, gti, np.abs(dt), scores


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_native_matches_numpy_fallback(monkeypatch):
    rng = np.random.default_rng(0)
    for d, g in [(0, 0), (5, 0), (0, 5), (1, 1), (7, 3), (40, 12), (60, 25)]:
        gt, gti, dt, scores = _random_case(rng, d, g)
        res_native = _evaluate_image_all_areas(gt, gti, dt, scores, 100)

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        res_np = _evaluate_image_all_areas(gt, gti, dt, scores, 100)
        monkeypatch.undo()

        for a, b, name in zip(res_native, res_np,
                              ("dtm", "dt_ig", "npig", "scores")):
            np.testing.assert_array_equal(a, b, err_msg=f"{name} d={d} g={g}")


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_summarize_same_with_and_without_native(monkeypatch):
    rng = np.random.default_rng(1)

    def build():
        ev = COCOEvaluator(2)
        for _ in range(8):
            gt, gti, dt, scores = _random_case(rng.spawn(1)[0], 10, 6)
            ev.add_image(gt, rng.integers(0, 2, 6), dt,
                         rng.integers(0, 2, 10), scores, gti)
        return ev

    rng = np.random.default_rng(1)
    m1 = build().summarize()
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    rng = np.random.default_rng(1)
    m2 = build().summarize()
    assert m1 == m2
