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


def test_gradflow_per_parameter_metrics(exp_cfg, tmp_path):
    """--gradflow logs per-PARAMETER mean |grad| scalars (reference:
    callbacks/gradflow.py:10-27 per-parameter bar charts)."""
    import json

    cfg = dataclasses.replace(
        exp_cfg,
        training=dataclasses.replace(exp_cfg.training, gradflow=True),
        save_dir=str(tmp_path), exp_name="gf")
    trainer = Trainer(cfg, dtype=jnp.float32)
    trainer.fit(max_steps=1, eval_split="val")
    with open(os.path.join(trainer.run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    gf = {k: v for r in recs for k, v in r.items()
          if k.startswith("gradflow/")}
    # one scalar per parameter leaf, spanning all three modules
    assert len(gf) > 50, len(gf)
    for mod in ("backbone", "fpn", "head"):
        assert any(k.startswith(f"gradflow/{mod}") for k in gf), mod
    assert all(np.isfinite(v) and v >= 0 for v in gf.values())


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


def test_unrolled_scan_equivalent():
    """make_train_step(unroll=L) emits straight-line HLO instead of a
    while loop (tools/mfu.py uses this for exact cost-analysis counts:
    the rolled loop's counts ignore the trip count) — the computed step
    must be identical to the rolled one."""
    import jax
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState, make_train_step

    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    det = Detector(model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    optimizer, _ = make_optimizer(TrainingConfig(learning_rate=1e-4))
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
    for unroll in (1, L):
        state = TrainState(variables=variables,
                           opt_state=optimizer.init(variables["params"]),
                           states=det.init_states(B, jnp.float32),
                           step=jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(det, optimizer, unroll=unroll))
        _, m = step(state, batch)
        results[unroll] = (float(m["loss"]), float(m["grad_norm"]))
    np.testing.assert_allclose(results[L], results[1], rtol=1e-5)


def test_metric_logger_sinks(tmp_path):
    """Pluggable remote sinks (the reference's WandB slot,
    loggers/utils.py:5-24): registered callables receive each
    float-converted record; a raising sink never breaks logging."""
    from leod_tpu.train.trainer import MetricLogger

    lg = MetricLogger(str(tmp_path / "m.jsonl"))
    got = []
    lg.add_sink(got.append)
    lg.add_sink(lambda r: 1 / 0)               # broken sink
    lg.log({"step": 1, "loss": np.float32(2.5)})
    lg.log({"step": 2, "loss": 1.0})
    assert got == [{"step": 1, "loss": 2.5}, {"step": 2, "loss": 1.0}]
    with open(lg.path) as f:
        assert len(f.readlines()) == 2         # JSONL unaffected


def test_restore_latest_falls_back_on_corrupt_payload(exp_cfg, tmp_path):
    """A checkpoint whose PAYLOAD is corrupted (metadata still readable)
    must not win auto-resume: restore_latest try-restores and falls back
    to the next-newest (reference: train.py:85-92)."""
    import dataclasses as _dc
    import glob
    import time

    cfg = _dc.replace(exp_cfg, save_dir=str(tmp_path), exp_name="fb")
    trainer = Trainer(cfg, dtype=jnp.float32)
    state = trainer.init_state(cfg.training.batch_size_train)
    good = state._replace(step=jnp.asarray(3, jnp.int32))
    trainer.save_checkpoint(good, "a")
    time.sleep(0.05)              # mtime-ordered candidates
    bad = state._replace(step=jnp.asarray(9, jnp.int32))
    trainer.save_checkpoint(bad, "b")
    trainer.wait_for_checkpoints()      # saves are async; land b first
    bad_dir = os.path.join(trainer.run_dir, "ckpt_b")
    for f in glob.glob(os.path.join(bad_dir, "d", "*")):
        with open(f, "wb") as fh:
            fh.write(b"garbage")
    # metadata probe alone would still pick the corrupted newest
    assert trainer.latest_checkpoint() == bad_dir
    restored, path = trainer.restore_latest(state)
    assert path == os.path.join(trainer.run_dir, "ckpt_a")
    assert int(restored.step) == 3
    # nothing restorable at all -> original state, path None
    for d in glob.glob(os.path.join(trainer.run_dir, "ckpt_*")):
        for f in glob.glob(os.path.join(d, "d", "*")):
            with open(f, "wb") as fh:
                fh.write(b"garbage")
    same, path = trainer.restore_latest(state)
    assert path is None and same is state


def test_best_checkpoint_top2_retention(exp_cfg, tmp_path):
    """Top-2 best-AP retention (reference: callbacks/custom.py:9-29
    save_top_k=2): a new best demotes ckpt_best to ckpt_best2; an AP
    beating only the runner-up replaces ckpt_best2; a worse AP saves
    nothing."""
    import dataclasses as _dc

    cfg = _dc.replace(exp_cfg, save_dir=str(tmp_path), exp_name="top2")
    trainer = Trainer(cfg, dtype=jnp.float32)
    base = trainer.init_state(cfg.training.batch_size_train)

    def step_of(name):
        from leod_tpu.train.trainer import load_checkpoint
        trainer.wait_for_checkpoints()  # saves are async
        return int(load_checkpoint(
            os.path.join(trainer.run_dir, f"ckpt_{name}"))["step"])

    trainer._save_best(0.5, base._replace(step=jnp.asarray(1, jnp.int32)))
    assert step_of("best") == 1
    assert not os.path.isdir(os.path.join(trainer.run_dir, "ckpt_best2"))
    trainer._save_best(0.7, base._replace(step=jnp.asarray(2, jnp.int32)))
    assert step_of("best") == 2 and step_of("best2") == 1
    trainer._save_best(0.6, base._replace(step=jnp.asarray(3, jnp.int32)))
    assert step_of("best") == 2 and step_of("best2") == 3
    trainer._save_best(0.4, base._replace(step=jnp.asarray(4, jnp.int32)))
    assert step_of("best") == 2 and step_of("best2") == 3
    assert trainer._best_aps == [0.7, 0.6]

    # retention state survives a preemption resume: a fresh Trainer that
    # restores ckpt_last must not let a WORSE post-resume AP clobber
    # ckpt_best
    trainer.save_checkpoint(base._replace(step=jnp.asarray(9, jnp.int32)),
                            "last")
    trainer.wait_for_checkpoints()  # t2 can't see trainer's in-flight save
    t2 = Trainer(cfg, dtype=jnp.float32)
    assert t2._best_aps == [-1.0, -1.0]
    st, path = t2.restore_latest(t2.init_state(cfg.training.batch_size_train))
    assert path.endswith("ckpt_last")
    assert t2._best_aps == [0.7, 0.6]
    t2._save_best(0.5, base._replace(step=jnp.asarray(10, jnp.int32)))
    t2.wait_for_checkpoints()   # step_of only flushes the OUTER trainer
    assert step_of("best") == 2 and step_of("best2") == 3   # unchanged


def test_eval_budget_autogrow(exp_cfg):
    """run_streaming_eval must never drop labeled frames: an undersized
    per-slot budget auto-regrows (recompiles) instead of warning
    (reference harvests ragged and can never drop,
    modules/utils/detection.py:27-58)."""
    import dataclasses as _dc

    # window of 8 reprs with labels every 4 -> 2 labeled frames/slot;
    # frames_per_slot=1 must regrow to 2, not drop
    cfg = _dc.replace(exp_cfg, dataset=_dc.replace(exp_cfg.dataset,
                                                   sequence_length=8))
    trainer = Trainer(cfg, dtype=jnp.float32)
    state = trainer.init_state(cfg.training.batch_size_train)
    m_small = run_streaming_eval(trainer.det, state.variables, cfg,
                                 split="val", frames_per_slot=1)
    m_big = run_streaming_eval(trainer.det, state.variables, cfg,
                               split="val", frames_per_slot=4)
    assert m_small is not None and m_big is not None
    np.testing.assert_allclose(m_small["AP"], m_big["AP"], atol=1e-9)


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
