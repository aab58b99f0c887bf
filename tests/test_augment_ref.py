"""Differential test: SpatialAugmentor vs the reference augmentor.

The reference RandomSpatialAugmentorGenX (data/utils/augmentor.py) is
imported directly (ref_shim provides a faithful torchvision-rotate shim)
and driven at FIXED augmentation parameters side-by-side with
leod_tpu.data.augment.SpatialAugmentor on identical random windows:
h-flip, rotation, zoom-in (shared fixed crop window), zoom-out, and their
compositions in the reference's application order (hflip -> rotate ->
zoom, augmentor.py:466-474). Event frames must agree exactly; box labels
to 1e-3 px.

Documented divergence carried over from the reference itself: torchvision
rotates FRAMES about the float pixel-center ((w-1)/2) while the reference
rotates LABELS about the int center (labels.py:341-342) — both frameworks
reproduce that half-pixel frame/label inconsistency identically.

VERDICT r3 item 8.
"""
from __future__ import annotations

import os.path as osp
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, osp.dirname(__file__))
import ref_shim  # noqa: E402

from leod_tpu.config import AugmentConfig, ZoomConfig  # noqa: E402
from leod_tpu.data.augment import AugmentParams, SpatialAugmentor  # noqa: E402
from leod_tpu.data.labels import Boxes  # noqa: E402

HW = (56, 72)   # even dims like the real sensors; small for speed


def _ref_cfg():
    return ref_shim._wrap({
        "prob_hflip": 0.5,
        "prob_tflip": 0.0,
        "rotate": {"prob": 0.5, "min_angle_deg": 0, "max_angle_deg": 20},
        "zoom": {
            "prob": 0.8,
            "zoom_in": {"weight": 8, "factor": {"min": 1.0, "max": 1.5}},
            "zoom_out": {"weight": 8, "factor": {"min": 1.0, "max": 1.2}},
        },
    })


def _random_window(rng, hw, T=4, C=3, num_boxes=5):
    h, w = hw
    ev = rng.integers(0, 255, size=(T, C, h, w)).astype(np.float32)
    labels = []
    for _ in range(T):
        if rng.uniform() < 0.3:
            labels.append(None)
            continue
        n = int(rng.integers(1, num_boxes + 1))
        x = rng.uniform(0, w - 10, n)
        y = rng.uniform(0, h - 10, n)
        bw = rng.uniform(3, np.minimum(w - 1 - x, 25))
        bh = rng.uniform(3, np.minimum(h - 1 - y, 25))
        rows = np.zeros((n, 8), np.float32)
        rows[:, 0] = rng.integers(1, 10 ** 6, n)        # t (GT)
        rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4] = x, y, bw, bh
        rows[:, 5] = rng.integers(0, 2, n)
        rows[:, 6] = rows[:, 7] = 1.0
        labels.append(rows)
    return ev, labels


def _run_reference(ev, labels, hw, params, zoom_xy):
    Augmentor, ObjectLabels, DataType = ref_shim.import_reference_augmentor()
    import data.utils.augmentor as ref_aug_mod
    from data.genx_utils.labels import SparselyBatchedObjectLabels

    aug = Augmentor(dataset_hw=tuple(hw), automatic_randomization=False,
                    augm_config=_ref_cfg())
    st = aug.augm_state
    st.apply_h_flip = params.hflip
    st.rotation.active = params.rotate_deg != 0.0
    st.rotation.angle_deg = params.rotate_deg
    st.zoom_in.active = params.zoom_in_factor > 1.0
    st.zoom_out.active = params.zoom_out is not None
    if params.zoom_out is not None:
        st.zoom_out.x0, st.zoom_out.y0 = params.zoom_out[0], params.zoom_out[1]
        st.zoom_out.zoom_out_factor = params.zoom_out[2]

    orig_sampler = ref_aug_mod.randomly_sample_zoom_window_from_objframe
    if params.zoom_in_factor > 1.0:
        # pin the zoom-in crop origin (normally sampled around a random
        # GT box) so both frameworks transform the same window
        ref_aug_mod.randomly_sample_zoom_window_from_objframe = \
            lambda objframe, zoom_window_height, zoom_window_width: zoom_xy
        # the reference reads the factor inside _zoom_in_and_rescale via
        # torch_uniform_sample_scalar — pin it too
        orig_uniform = ref_aug_mod.torch_uniform_sample_scalar
        ref_aug_mod.torch_uniform_sample_scalar = \
            lambda min_value, max_value: params.zoom_in_factor
    try:
        obj = [None if rows is None
               else ObjectLabels(torch.from_numpy(rows.copy()), tuple(hw))
               for rows in labels]
        data = {
            DataType.EV_REPR: [torch.from_numpy(f.copy()) for f in ev],
            DataType.OBJLABELS_SEQ: SparselyBatchedObjectLabels(obj),
        }
        out = aug(data)
    finally:
        ref_aug_mod.randomly_sample_zoom_window_from_objframe = orig_sampler
        if params.zoom_in_factor > 1.0:
            ref_aug_mod.torch_uniform_sample_scalar = orig_uniform
    ev_out = np.stack([t.numpy() for t in out[DataType.EV_REPR]])
    lab_out = []
    for ol in out[DataType.OBJLABELS_SEQ]:
        if ol is None or len(ol) == 0:
            lab_out.append(None)
        else:
            if not ol._is_numpy:
                ol.numpy_()
            lab_out.append(np.asarray(ol.object_labels, np.float64))
    return ev_out, lab_out


def _run_mine(ev, labels, hw, params, zoom_xy):
    cfg = AugmentConfig(zoom=ZoomConfig())
    aug = SpatialAugmentor(hw, cfg, rng=np.random.default_rng(0))
    aug.params = params
    if params.zoom_in_factor > 1.0:
        aug._pick_zoom_in_window = lambda labels, factor: zoom_xy
    sample = {
        "ev_repr": ev.copy(),
        "labels": [None if r is None else Boxes(r.copy(), hw)
                   for r in labels],
        "skipped_labels": [None] * len(labels),
    }
    out = aug.apply(sample)
    lab_out = [None if b is None or len(b) == 0
               else np.asarray(b.arr, np.float64) for b in out["labels"]]
    return out["ev_repr"], lab_out


def _compare(seed, ref_ev, ref_lab, my_ev, my_lab):
    np.testing.assert_array_equal(ref_ev, my_ev,
                                  err_msg=f"seed {seed}: frames differ")
    assert len(ref_lab) == len(my_lab)
    for t, (r, m) in enumerate(zip(ref_lab, my_lab)):
        assert (r is None) == (m is None), f"seed {seed} t={t}: None-ness"
        if r is None:
            continue
        assert r.shape == m.shape, f"seed {seed} t={t}: box count"
        np.testing.assert_allclose(m, r, atol=1e-3, rtol=0,
                                   err_msg=f"seed {seed} t={t}: boxes")


def _case(seed, params):
    rng = np.random.default_rng(seed)
    ev, labels = _random_window(rng, HW)
    # a zoom-in crop origin valid for the window size at this factor
    if params.zoom_in_factor > 1.0:
        win_h = int(HW[0] / params.zoom_in_factor)
        win_w = int(HW[1] / params.zoom_in_factor)
        zoom_xy = (int(rng.integers(0, HW[1] - win_w + 1)),
                   int(rng.integers(0, HW[0] - win_h + 1)))
    else:
        zoom_xy = None
    ref_ev, ref_lab = _run_reference(ev, labels, HW, params, zoom_xy)
    my_ev, my_lab = _run_mine(ev, labels, HW, params, zoom_xy)
    _compare(seed, ref_ev, ref_lab, my_ev, my_lab)


PARAMS = [
    AugmentParams(hflip=True),
    AugmentParams(rotate_deg=7.3),
    AugmentParams(rotate_deg=-11.9),
    AugmentParams(rotate_deg=90.0),
    AugmentParams(rotate_deg=180.0),
    AugmentParams(zoom_in_factor=1.3),
    AugmentParams(zoom_out=(5, 3, 1.18)),
    AugmentParams(hflip=True, rotate_deg=5.7),
    AugmentParams(hflip=True, zoom_in_factor=1.45),
    AugmentParams(hflip=True, rotate_deg=-14.2, zoom_in_factor=1.25),
    AugmentParams(hflip=True, rotate_deg=9.1, zoom_out=(8, 6, 1.15)),
]


@pytest.mark.parametrize("pi", range(len(PARAMS)))
def test_augment_matches_reference(pi):
    for rep in range(3):
        _case(seed=100 * pi + rep, params=PARAMS[pi])
