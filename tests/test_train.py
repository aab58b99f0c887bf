"""End-to-end training loop on a tiny synthetic dataset (CPU)."""
import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from leod_tpu.config import (BackboneConfig, HeadConfig, ModelConfig,
                             TrainingConfig, ExperimentConfig, dataset_preset)
from leod_tpu.data.synthetic import generate_dataset
from leod_tpu.train.trainer import Trainer, run_streaming_eval


@pytest.fixture(scope="module")
def exp_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    generate_dataset(str(root), num_train=2, num_val=2, num_test=0,
                     num_reprs=32, label_every=4, first_label_repr=11,
                     hw=(64, 96))
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=str(root), resolution_hw=(64, 96),
        sequence_length=4)
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    training = TrainingConfig(max_steps=6, batch_size_train=2,
                              batch_size_eval=2, val_check_interval=0,
                              max_det_frames=3, learning_rate=1e-4)
    return ExperimentConfig(dataset=dst, model=model, training=training,
                            save_dir=str(tmp_path_factory.mktemp("runs")),
                            exp_name="t")


def test_train_time_viz_panels(exp_cfg, tmp_path):
    """Pred-vs-GT panels land in <run_dir>/viz/ every viz_every_steps
    (reference: callbacks/detection.py:20-107)."""
    import glob

    cfg = dataclasses.replace(
        exp_cfg,
        training=dataclasses.replace(exp_cfg.training, viz_every_steps=2),
        save_dir=str(tmp_path), exp_name="viz")
    trainer = Trainer(cfg, dtype=jnp.float32)
    trainer.fit(max_steps=4, eval_split="val")
    panels = glob.glob(os.path.join(trainer.run_dir, "viz", "*.png"))
    assert len(panels) == 2, panels    # steps 2 and 4


def test_fit_and_eval_and_resume(exp_cfg):
    trainer = Trainer(exp_cfg, dtype=jnp.float32)
    state = trainer.fit(max_steps=4, eval_split="val")
    assert int(state.step) == 4
    # metrics got logged
    path = os.path.join(trainer.run_dir, "metrics.jsonl")
    assert os.path.getsize(path) > 0
    # stream state table is alive (non-zero)
    assert float(jnp.abs(state.states[0][0]).sum()) > 0

    m = run_streaming_eval(trainer.det, state.variables, exp_cfg,
                           split="val", frames_per_slot=4)
    assert m is not None and np.isfinite(m["AP"])

    # checkpoint roundtrip: weight-only and full resume
    trainer.save_checkpoint(state, "t0")
    ckpt = os.path.join(trainer.run_dir, "ckpt_t0")
    st2 = trainer.init_state(exp_cfg.training.batch_size_train)
    st2 = trainer.load_weights(ckpt, st2)
    import jax
    for a, b in zip(jax.tree.leaves(state.variables["params"]),
                    jax.tree.leaves(st2.variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    st3 = trainer.restore_checkpoint(ckpt, st2)
    assert int(st3.step) == 4
    # continue training from the restored state
    st4 = trainer.fit(max_steps=6, state=st3)
    assert int(st4.step) == 6


def test_remat_policies_equivalent():
    """Every TBPTT remat policy (TrainingConfig.remat) computes the SAME
    step: identical loss and gradient norm; only the backward-pass
    recompute/storage trade-off differs."""
    import jax
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState, make_train_step

    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    tc = TrainingConfig(learning_rate=1e-4)
    det = Detector(model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    optimizer, _ = make_optimizer(tc)
    B, L, M = 2, 3, 2
    rng = np.random.default_rng(0)
    labels = np.zeros((B, M, 8, 7), np.float32)
    labels[:, :, 0] = [0, 40, 30, 24, 20, 1, 1]
    batch = {
        "ev": jnp.asarray(rng.integers(0, 50, (L, B, 64, 96, 20)),
                          jnp.uint8),
        "is_first": jnp.zeros((B,), bool),
        "frame_t": jnp.asarray(np.tile([L - 2, L - 1], (B, 1)), jnp.int32),
        "frame_mask": jnp.ones((B, M), bool),
        "labels": jnp.asarray(labels),
    }
    results = {}
    for remat in ("full", "dots", "stage1", "none"):
        state = TrainState(variables=variables,
                           opt_state=optimizer.init(variables["params"]),
                           states=det.init_states(B, jnp.float32),
                           step=jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(det, optimizer, remat=remat))
        _, m = step(state, batch)
        results[remat] = (float(m["loss"]), float(m["grad_norm"]))
    ref = results["full"]
    for k, v in results.items():
        np.testing.assert_allclose(v, ref, rtol=1e-5, err_msg=k)


def test_preemption_stop_checkpoints_and_exits(exp_cfg, tmp_path):
    """request_stop() (wired to SIGTERM inside fit) checkpoints at the
    next step boundary and exits instead of running to max_steps."""
    import dataclasses as _dc

    cfg = _dc.replace(exp_cfg, save_dir=str(tmp_path), exp_name="preempt")
    trainer = Trainer(cfg, dtype=jnp.float32)
    trainer.request_stop()
    state = trainer.fit(max_steps=50)
    assert int(state.step) <= 1                 # stopped immediately
    assert os.path.isdir(os.path.join(trainer.run_dir, "ckpt_last"))
    # the saved checkpoint restores
    st = trainer.init_state(cfg.training.batch_size_train)
    st = trainer.restore_checkpoint(
        os.path.join(trainer.run_dir, "ckpt_last"), st)
    assert int(st.step) == int(state.step)
