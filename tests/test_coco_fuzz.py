"""Differential fuzz: leod_tpu.eval.coco (numpy + C++ kernel) vs a naive
transcription of the pycocotools COCOeval algorithm (tests/coco_oracle.py).

The reference's metric IS pycocotools/COCOeval_opt (reference:
utils/evaluation/prophesee/metrics/coco_eval.py:16-29). A subtle
matching/accumulate divergence would shift every reported mAP silently,
so the evaluator is fuzzed over randomized image sets that concentrate
on the protocol's edge cases: empty dets/GTs, exact score ties,
duplicate boxes, ignore boxes, area-range boundaries (32^2 / 96^2),
degenerate boxes, and > MAX_DETS detections.
"""
import numpy as np
import pytest

from leod_tpu.eval.coco import COCOEvaluator

from coco_oracle import oracle_summarize

KEYS = ("AP", "AP_50", "AP_75", "AP_S", "AP_M", "AP_L")


def _rand_boxes(rng: np.random.Generator, n: int) -> np.ndarray:
    """xywh boxes spanning all three area buckets, some degenerate, some
    exactly ON the 32^2 / 96^2 area boundaries."""
    if n == 0:
        return np.zeros((0, 4))
    xy = rng.uniform(0, 200, (n, 2))
    # mix of sides so areas land small/medium/large
    wh = rng.uniform(2, 120, (n, 2))
    boxes = np.concatenate([xy, wh], axis=1)
    for i in range(n):
        r = rng.random()
        if r < 0.08:                       # area exactly 32^2 (boundary)
            boxes[i, 2:] = (32.0, 32.0)
        elif r < 0.16:                     # area exactly 96^2 (boundary)
            boxes[i, 2:] = (96.0, 96.0)
        elif r < 0.22:                     # degenerate (zero-ish area)
            boxes[i, 2 + int(rng.integers(2))] = 0.0
    return boxes


def _rand_image(rng: np.random.Generator, num_cats: int) -> dict:
    G = int(rng.integers(0, 6))
    D = int(rng.integers(0, 9))
    if rng.random() < 0.1:
        G = 0
    if rng.random() < 0.1:
        D = 0
    gt_boxes = _rand_boxes(rng, G)
    # half the dets are near-copies of GTs (so matches actually occur at
    # multiple IoU thresholds), the rest random
    dt_boxes = _rand_boxes(rng, D)
    for i in range(D):
        if G and rng.random() < 0.5:
            g = gt_boxes[int(rng.integers(G))].copy()
            g[:2] += rng.normal(0, 2, 2)
            g[2:] *= rng.uniform(0.85, 1.15, 2)
            dt_boxes[i] = g
    scores = rng.uniform(0.05, 1.0, D)
    # force exact score ties within and across images
    if D >= 2 and rng.random() < 0.5:
        scores[: D // 2 + 1] = round(float(scores[0]), 1)
    return {
        "gt_boxes": gt_boxes,
        "gt_cats": rng.integers(0, num_cats, G),
        "gt_ignore": rng.random(G) < 0.25,
        "dt_boxes": dt_boxes,
        "dt_cats": rng.integers(0, num_cats, D),
        "dt_scores": scores,
    }


def _run_ours(images, num_cats) -> dict:
    ev = COCOEvaluator(num_cats)
    for img in images:
        ev.add_image(img["gt_boxes"], img["gt_cats"], img["dt_boxes"],
                     img["dt_cats"], img["dt_scores"],
                     gt_ignore=img["gt_ignore"])
    return ev.summarize()


def _check(images, num_cats, label):
    ours = _run_ours(images, num_cats)
    want = oracle_summarize(images, num_cats)
    for k in KEYS:
        assert ours[k] == pytest.approx(want[k], abs=1e-12), (
            f"{label}: {k} ours={ours[k]} oracle={want[k]}")


def test_fuzz_vs_pycocotools_oracle():
    """>= 1000 randomized image sets, exact metric agreement."""
    rng = np.random.default_rng(0)
    for trial in range(1000):
        num_cats = int(rng.integers(1, 4))
        images = [_rand_image(rng, num_cats)
                  for _ in range(int(rng.integers(1, 4)))]
        _check(images, num_cats, f"trial {trial}")


def test_fuzz_numpy_fallback_path(monkeypatch):
    """The pure-numpy matching path (used when the C++ kernel is absent)
    must agree with the oracle too."""
    import leod_tpu.native as native

    monkeypatch.setattr(native, "coco_eval_image", lambda *a, **k: None)
    rng = np.random.default_rng(1)
    for trial in range(150):
        num_cats = int(rng.integers(1, 3))
        images = [_rand_image(rng, num_cats)
                  for _ in range(int(rng.integers(1, 3)))]
        _check(images, num_cats, f"fallback trial {trial}")


def test_more_than_max_dets_capped():
    """> 100 detections in one image: only the 100 highest-scoring count
    (pycocotools maxDets), including tie runs crossing the cutoff."""
    rng = np.random.default_rng(2)
    g = _rand_boxes(rng, 5)
    d = np.concatenate([np.repeat(g, 30, axis=0), _rand_boxes(rng, 20)])
    scores = np.concatenate([np.full(75, 0.7), rng.uniform(0, 1, 95)])
    images = [{
        "gt_boxes": g, "gt_cats": np.zeros(5, int),
        "gt_ignore": np.zeros(5, bool),
        "dt_boxes": d, "dt_cats": np.zeros(len(d), int),
        "dt_scores": scores,
    }]
    _check(images, 1, "maxdets")


def test_all_gt_ignored_gives_minus_one():
    """npig == 0 for a category/area leaves precision at -1 and the
    summary mean excludes it (pycocotools convention)."""
    rng = np.random.default_rng(3)
    g = _rand_boxes(rng, 3)
    images = [{
        "gt_boxes": g, "gt_cats": np.zeros(3, int),
        "gt_ignore": np.ones(3, bool),
        "dt_boxes": _rand_boxes(rng, 4), "dt_cats": np.zeros(4, int),
        "dt_scores": rng.uniform(0, 1, 4),
    }]
    ours = _run_ours(images, 1)
    want = oracle_summarize(images, 1)
    assert ours["AP"] == want["AP"] == -1.0
