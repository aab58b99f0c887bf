"""Online SSOD: weak/strong augmentor, label mapping, EMA teacher.

The reference ships these components dead (ssod_augmentor.py never
constructed; modules/utils/ssod.py:353-460 never called;
build.py:10 asserts `not ssod`) — here they are live, so the tests
exercise the actual training path.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from leod_tpu.config import AugmentConfig, SSODOnlineConfig, ZoomConfig
from leod_tpu.data.augment import (AugmentParams, SpatialAugmentor,
                                   SSODAugmentor, weak_to_strong_boxes)
from leod_tpu.data.labels import Boxes
from leod_tpu.selftrain.online import make_teacher_update

HW = (64, 80)


def _sample(rng, L=4, with_labels=(1, 3)):
    ev = rng.integers(0, 255, (L, 6, *HW), np.uint8)
    labels = [None] * L
    for t in with_labels:
        arr = np.zeros((2, 8), np.float32)
        arr[:, 0] = (t + 1) * 50_000
        arr[0, 1:5] = (12, 10, 22, 18)
        arr[1, 1:5] = (40, 30, 18, 14)
        arr[:, 5] = (0, 1)
        arr[:, 6] = arr[:, 7] = 1.0
        labels[t] = Boxes(arr, HW)
    return {"ev_repr": ev, "labels": labels,
            "skipped_labels": [None] * L,
            "is_first_sample": True, "is_last_sample": False,
            "is_padded": np.zeros(L, bool), "ev_idx": np.arange(L),
            "path": "p"}


FULL_AUG = AugmentConfig(prob_hflip=0.5, prob_tflip=0.0, rotate_prob=1.0,
                         zoom=ZoomConfig(prob=1.0))


@pytest.mark.parametrize("seed", range(8))
def test_weak_to_strong_matches_direct_strong_labels(seed):
    """Mapping weak-view boxes through weak_to_strong_boxes must land
    exactly on the labels the strong view computes directly — the
    invariant the teacher->student pseudo-label hand-off relies on."""
    rng = np.random.default_rng(seed)
    ssod = SSODAugmentor(HW, FULL_AUG, rng)
    ssod.randomize()
    sample = _sample(rng)
    weak, strong = ssod(sample)
    for t in range(len(sample["labels"])):
        base = sample["labels"][t]
        w_lab, s_lab = weak["labels"][t], strong["labels"][t]
        if base is None:
            assert w_lab is None and s_lab is None
            continue
        mapped = weak_to_strong_boxes(w_lab, ssod.weak.params,
                                      ssod.strong.last_applied)
        if s_lab is None:
            assert len(mapped) == 0
            continue
        np.testing.assert_allclose(mapped.arr, s_lab.arr, rtol=1e-5,
                                   atol=1e-4)


def test_weak_view_is_hflip_only():
    rng = np.random.default_rng(0)
    ssod = SSODAugmentor(HW, FULL_AUG, rng)
    for _ in range(10):
        ssod.randomize()
        sample = _sample(rng)
        weak, _ = ssod(sample)
        base = sample["ev_repr"]
        if ssod.weak.params.hflip:
            np.testing.assert_array_equal(weak["ev_repr"], base[..., ::-1])
        else:
            np.testing.assert_array_equal(weak["ev_repr"], base)
        assert not ssod.weak.params.tflip
        assert ssod.weak.params.rotate_deg == 0.0
        assert ssod.weak.params.zoom_in_factor == 1.0
        assert ssod.weak.params.zoom_out is None


def test_strong_zoom_in_random_fallback_without_labels():
    """Unlabeled windows must still get zoom-in (random crop origin) —
    the plain augmentor would deactivate it."""
    rng = np.random.default_rng(1)
    cfg = AugmentConfig(prob_hflip=0.0, rotate_prob=0.0,
                        zoom=ZoomConfig(prob=1.0, zoom_in_weight=1.0,
                                        zoom_out_weight=0.0,
                                        zoom_in_min=1.3, zoom_in_max=1.5))
    aug = SpatialAugmentor(HW, cfg, rng, zoom_in_random_fallback=True)
    plain = SpatialAugmentor(HW, cfg, rng)
    sample = _sample(rng, with_labels=())
    aug.randomize()
    aug.params.zoom_in_factor = 1.4
    out = aug.apply(sample)
    assert aug.last_applied.zoom_in_xy is not None
    assert not np.array_equal(out["ev_repr"], sample["ev_repr"])
    plain.randomize()
    plain.params = dataclasses.replace(plain.params, zoom_in_factor=1.4)
    out2 = plain.apply(sample)
    assert plain.last_applied.zoom_in_factor == 1.0   # deactivated
    np.testing.assert_array_equal(out2["ev_repr"], sample["ev_repr"])


def test_applied_record_tracks_per_window_zoom():
    rng = np.random.default_rng(2)
    aug = SpatialAugmentor(HW, FULL_AUG, rng, zoom_in_random_fallback=True)
    aug.randomize()
    aug.params = dataclasses.replace(aug.params, zoom_in_factor=1.3,
                                     zoom_out=None)
    xy = set()
    for _ in range(6):
        aug.apply(_sample(rng))
        assert aug.last_applied.zoom_in_xy is not None
        xy.add(aug.last_applied.zoom_in_xy)
    assert len(xy) > 1    # crop origin re-picked per window


def test_ema_teacher_update():
    upd = make_teacher_update("ema", alpha=0.9)
    teacher = {"w": jnp.zeros(3, jnp.float32)}
    student = {"w": jnp.ones(3, jnp.bfloat16)}
    # step 0: true average warm-up -> alpha_t = 0 -> teacher = student
    t1 = upd(teacher, student, 0)
    np.testing.assert_allclose(np.asarray(t1["w"]), 1.0)
    assert t1["w"].dtype == jnp.float32
    # large step: alpha_t = 0.9
    t2 = upd({"w": jnp.zeros(3)}, student, 10_000)
    np.testing.assert_allclose(np.asarray(t2["w"]), 0.1, rtol=1e-5)


def test_every_n_teacher_update():
    upd = make_teacher_update("every-3")
    teacher = {"w": jnp.zeros(2)}
    student = {"w": jnp.ones(2)}
    assert np.asarray(upd(teacher, student, 0)["w"]).sum() == 0   # step 1
    assert np.asarray(upd(teacher, student, 1)["w"]).sum() == 0
    assert np.asarray(upd(teacher, student, 2)["w"]).sum() == 2   # step 3


def test_ssod_config_cli_shape():
    oc = SSODOnlineConfig(enabled=True, alpha=0.99)
    assert oc.update_method == "ema" and oc.use_gt


# -- loader pairing + end-to-end fit -------------------------------------

@pytest.fixture(scope="module")
def ssod_exp_cfg(tmp_path_factory):
    from leod_tpu.config import (BackboneConfig, ExperimentConfig,
                                 HeadConfig, ModelConfig, TrainingConfig,
                                 dataset_preset)
    from leod_tpu.data.synthetic import generate_dataset

    root = tmp_path_factory.mktemp("synth_ssod")
    generate_dataset(str(root), num_train=2, num_val=1, num_test=0,
                     num_reprs=32, label_every=4, first_label_repr=11,
                     hw=(64, 96))
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=str(root), resolution_hw=(64, 96),
        sequence_length=4)
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    training = TrainingConfig(
        max_steps=3, batch_size_train=2, batch_size_eval=2,
        val_check_interval=0, learning_rate=1e-4,
        ssod_online=SSODOnlineConfig(enabled=True, burn_in_steps=1,
                                     obj_thresh=0.05, cls_thresh=0.05,
                                     skip_first_t=1))
    return ExperimentConfig(dataset=dst, model=model, training=training,
                            save_dir=str(tmp_path_factory.mktemp("runs")),
                            exp_name="ssod")


def test_stream_loader_ssod_pairs(ssod_exp_cfg):
    from leod_tpu.data.loader import (StreamTrainLoader,
                                      open_split_sequences)

    seqs = open_split_sequences(ssod_exp_cfg.dataset, "train")
    loader = StreamTrainLoader(seqs, ssod_exp_cfg.dataset, 2, seed=0,
                               ssod=True)
    it = iter(loader)
    for _ in range(3):
        pair = next(it)
        weak, strong = pair["weak"], pair["strong"]
        assert weak["ev"].shape == strong["ev"].shape
        np.testing.assert_array_equal(weak["is_first"], strong["is_first"])
        np.testing.assert_array_equal(weak["is_padded"],
                                      strong["is_padded"])
        assert len(pair["weak_params"]) == 2
        assert all(isinstance(p, AugmentParams)
                   for p in pair["strong_applied"])
        # weak view never rotates/zooms/t-flips
        for p in pair["weak_params"]:
            assert p.rotate_deg == 0.0 and p.zoom_out is None \
                and p.zoom_in_factor == 1.0 and not p.tflip


def test_burn_in_counter_seeds_from_restored_step(ssod_exp_cfg):
    """A resumed run must not re-impose the GT-only burn-in: the batch
    counter seeds from the restored optimizer step (preemption-resume is
    a first-class path here, trainer.py SIGTERM handling)."""
    import jax
    from leod_tpu.models.detector import Detector
    from leod_tpu.selftrain.online import OnlineSSODBatcher

    det = Detector(ssod_exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=2)
    b = OnlineSSODBatcher(None, det, variables, ssod_exp_cfg, 2,
                          start_step=7)
    assert b.batches_out == 7    # burn_in_steps=1 long since passed


def test_online_ssod_fit(ssod_exp_cfg):
    """Three optimizer steps with the live EMA-teacher loop: burn-in
    step trains on GT only, steps 2-3 merge teacher pseudo labels (the
    0.05 thresholds ensure a random-init teacher emits some)."""
    import jax
    from leod_tpu.train.trainer import Trainer

    trainer = Trainer(ssod_exp_cfg, dtype=jnp.float32)
    state = trainer.fit(max_steps=3, eval_split="val", log_every=1)
    assert int(state.step) == 3
    import json
    with open(f"{trainer.run_dir}/metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 3
    assert all(np.isfinite(r["loss"]) for r in recs)


def test_online_ssod_fit_on_mesh(ssod_exp_cfg):
    """Online SSOD over a single-host device mesh: the mesh-replicated
    student must not mix device sets with the single-device teacher
    (online.py _local_replica — a bare copy of the replicated tree used
    to crash the eval_step/EMA jits with 'incompatible devices')."""
    import jax
    from leod_tpu.parallel.mesh import make_mesh
    from leod_tpu.train.trainer import Trainer

    trainer = Trainer(ssod_exp_cfg, dtype=jnp.float32,
                      mesh=make_mesh(2))   # cfg batch is 2: 1 row/device
    # the device-set coverage is the per-batch TEACHER inference +
    # EMA update (val_check_interval is 0 — no val eval runs in fit)
    state = trainer.fit(max_steps=2, log_every=1)
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.variables["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))
