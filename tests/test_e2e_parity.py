"""Cross-framework accuracy loop (scaled-down CI version of
tools/e2e_parity.py — see that script and docs/benchmarks.md for the
full 300/1500-step experiment results).

Asserts the two decisive properties on the same synthetic dataset:

  1. EVAL-STACK PARITY: identical (converted) weights through the
     reference model + reference postprocess (torch, transcription of
     Module._val_test_step_impl) and through leod_tpu's
     run_streaming_eval give identical AP metrics.
  2. TRAIN-TRAJECTORY PARITY: training both frameworks from the same
     init on the identical batch stream gives matching early losses
     (the first step exactly; the first 20 steps within a few percent —
     SimOTA's discrete dynamic-k assignment amplifies fp accumulation
     differences over time, so long-horizon parity is assessed by final
     AP in the tools script, not per-step loss).
"""
import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import e2e_parity as ep  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from leod_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("parity"))
    generate_dataset(root, num_train=2, num_val=2, num_test=0,
                     num_reprs=32, label_every=4, first_label_repr=3,
                     hw=(ep.H, ep.W))
    cfg = ep.build_cfg(root)
    ref = ep.make_reference()
    variables = ep.convert_ref(ref)
    return cfg, ref, variables


@pytest.mark.slow
def test_train_trajectory_and_eval_stack_parity(setup):
    import jax
    import jax.numpy as jnp

    from leod_tpu.data.loader import StreamTrainLoader, open_split_sequences
    from leod_tpu.models.detector import Detector

    cfg, ref, variables = setup
    det = Detector(cfg.model, dtype=jnp.float32)

    seqs = open_split_sequences(cfg.dataset, "train")
    it = iter(StreamTrainLoader(seqs, cfg.dataset, ep.B, seed=0))
    batches = [next(it) for _ in range(20)]
    for s in seqs:
        s.close()

    jl, _ = ep.jax_train(det, variables, batches, cfg)
    rl = ep.ref_train(ref, batches, cfg.training.learning_rate)

    # step 1 is identical math on identical weights: near-exact
    assert jl[0] == pytest.approx(rl[0], rel=1e-4)
    rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(rl, jl)]
    assert float(np.mean(rel)) < 0.06, rel

    # eval-stack parity at the (torch-trained) shared weights
    m_ref = ep.ref_streaming_eval(ref, cfg)
    vars_t = jax.device_put(ep.convert_ref(ref))
    m_jax = ep.jax_streaming_eval(det, vars_t, cfg)
    for k in ep.AP_KEYS:
        assert m_jax[k] == pytest.approx(m_ref[k], abs=1e-3), k


@pytest.mark.slow
def test_eval_stack_parity_gen4_flavor(tmp_path):
    """gen4-flavor eval-stack parity: 3 classes + downsample_by_factor_2
    (labels on disk at FULL resolution, ev frames at half; eval filters
    halved — reference io/box_filtering.py:18-36) + tflip_offset -2.
    Identical converted weights through the reference eval transcription
    and run_streaming_eval must give identical per-class AP."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import torch

    from leod_tpu.config import (AugmentConfig, BackboneConfig,
                                 ExperimentConfig, HeadConfig, ModelConfig,
                                 TrainingConfig, ZoomConfig, dataset_preset)
    from leod_tpu.convert import convert_torch_state_dict
    from leod_tpu.data.synthetic import generate_dataset
    from leod_tpu.models.detector import Detector

    from ref_shim import import_reference_detector, reference_model_config

    root = str(tmp_path / "g4")
    # full res 128x128, ev frames stored at 64x64 (_ds2_nearest layout)
    generate_dataset(root, num_train=0, num_val=3, num_test=0,
                     num_reprs=24, label_every=4, first_label_repr=3,
                     hw=(128, 128), ds2=True, num_classes=3)
    no_aug = AugmentConfig(prob_hflip=0.0, prob_tflip=0.0, rotate_prob=0.0,
                           zoom=ZoomConfig(prob=0.0))
    dst = dataclasses.replace(
        dataset_preset("gen4"), path=root, resolution_hw=(128, 128),
        sequence_length=4, augment_stream=no_aug, augment_random=no_aug)
    assert dst.downsample_by_factor_2 and dst.tflip_offset == -2
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 64),
                                partition_size=(2, 2)),
        head=HeadConfig(num_classes=3, max_gt=8))
    cfg = ExperimentConfig(dataset=dst, model=model,
                           training=TrainingConfig(batch_size_eval=3),
                           save_dir=root, exp_name="g4")

    RefDet = import_reference_detector()
    ref = RefDet(reference_model_config(num_classes=3,
                                        partition_size=(2, 2)))
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.05)
    variables = jax.device_put(convert_torch_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}))
    det = Detector(cfg.model, dtype=jnp.float32)

    # high-ish conf so a random-init model yields a modest, stable set
    m_ref = ep.ref_streaming_eval(ref, cfg, conf=0.01, batch_size=3)
    m_jax = ep.jax_streaming_eval(det, variables, cfg, conf=0.01)
    for k in ("AP", "AP_50", "AP_75", "AP_pedestrian", "AP_two-wheeler",
              "AP_car"):
        assert m_jax[k] == pytest.approx(m_ref[k], abs=1e-3), k


@pytest.mark.slow
def test_soft_student_loss_parity(setup, tmp_path):
    """Probe-3 CI version (tools/e2e_parity.py --soft-steps): pseudo
    labels generated from a shared teacher, then BOTH frameworks take
    soft (ignore-region) training steps on the identical dense pseudo
    batch stream — reference rnndet-soft routing, yolo_head.py:776-972
    get_losses_w_ignore. First-step loss must match exactly (identical
    math on identical weights); early steps stay within a few percent."""
    import jax
    import jax.numpy as jnp

    from leod_tpu.data.loader import StreamTrainLoader, open_split_sequences
    from leod_tpu.models.detector import Detector

    cfg, ref, variables = setup
    det = Detector(cfg.model, dtype=jnp.float32)

    # give the teacher enough signal to emit confident detections
    # (pseudo thresholds are 0.1; a default-prior objectness bias of
    # ~0.01 would otherwise yield an empty pseudo label field)
    seqs = open_split_sequences(cfg.dataset, "train")
    it = iter(StreamTrainLoader(seqs, cfg.dataset, ep.B, seed=3))
    warm = [next(it) for _ in range(15)]
    for s in seqs:
        s.close()
    ep.ref_train(ref, warm, cfg.training.learning_rate)
    teacher_vars = ep.convert_ref(ref)

    pseudo_root = str(tmp_path / "pseudo")
    ep.generate_pseudo(det, jax.device_put(teacher_vars), cfg, pseudo_root)
    cfg_soft = ep.build_soft_cfg(pseudo_root)
    det_soft = Detector(cfg_soft.model, dtype=jnp.float32)
    batches = ep.collect_dense_batches(cfg_soft, steps=5)

    jl, _ = ep.jax_train(det_soft, teacher_vars, batches, cfg_soft,
                         budget=ep.L)
    ref_soft = ep.make_soft_reference(ref)
    rl = ep.ref_train(ref_soft, batches, cfg.training.learning_rate)

    assert jl[0] == pytest.approx(rl[0], rel=1e-4)
    rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(rl, jl)]
    assert float(np.mean(rel)) < 0.08, rel
