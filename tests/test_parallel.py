"""Data-parallel training over the 8-device virtual CPU mesh."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leod_tpu.config import (BackboneConfig, ExperimentConfig, HeadConfig,
                             ModelConfig, TrainingConfig, dataset_preset)
from leod_tpu.data.synthetic import generate_dataset
from leod_tpu.parallel.mesh import DATA_AXIS, make_mesh
from leod_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def exp_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_dp")
    generate_dataset(str(root), num_train=2, num_val=0, num_test=0,
                     num_reprs=24, label_every=4, first_label_repr=11,
                     hw=(64, 96))
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=str(root), resolution_hw=(64, 96),
        sequence_length=4, train_sampling="stream")
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    training = TrainingConfig(max_steps=2, batch_size_train=8,
                              batch_size_eval=8, val_check_interval=0,
                              max_det_frames=2, learning_rate=1e-4)
    return ExperimentConfig(dataset=dst, model=model, training=training,
                            save_dir=str(tmp_path_factory.mktemp("runs_dp")),
                            exp_name="dp")


def test_data_parallel_training(exp_cfg):
    assert jax.device_count() == 8
    mesh = make_mesh()
    trainer = Trainer(exp_cfg, dtype=jnp.float32, mesh=mesh)
    state = trainer.fit(max_steps=2)
    assert int(state.step) == 2
    # state table sharded over all 8 devices; params replicated
    assert len(state.states[0][0].sharding.device_set) == 8
    assert state.states[0][0].sharding.spec[0] == DATA_AXIS
    p0 = jax.tree.leaves(state.variables["params"])[0]
    assert len(p0.sharding.device_set) == 8          # fully replicated
    assert p0.sharding.is_fully_replicated
    # params finite
    for leaf in jax.tree.leaves(state.variables["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_single_vs_multi_device_equivalence(exp_cfg):
    """One jitted step on 1 device vs 8 devices gives the same loss."""
    from leod_tpu.data.loader import (StreamTrainLoader, harvest_frames,
                                      open_split_sequences)
    from leod_tpu.parallel.mesh import shard_batch
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState, make_train_step

    cfg = exp_cfg
    trainer = Trainer(cfg, dtype=jnp.float32)
    seqs = open_split_sequences(cfg.dataset, "train")
    loader = StreamTrainLoader(seqs, cfg.dataset, 8, seed=0)
    batch = next(iter(loader))
    hb = harvest_frames(batch, 2, cfg.model.head.max_gt, (64, 96))
    dev = {k: hb[k] for k in ("ev", "is_first", "frame_t", "frame_mask",
                              "labels")}
    optimizer, _ = make_optimizer(cfg.training)
    step_fn = make_train_step(trainer.det, optimizer)

    state1 = trainer.init_state(8, seed=0)
    _, m1 = jax.jit(step_fn)(state1, dev)

    mesh = make_mesh()
    trainer8 = Trainer(cfg, dtype=jnp.float32, mesh=mesh)
    trainer8.det = trainer.det
    state8 = trainer8._place(trainer.init_state(8, seed=0))
    dev8 = shard_batch(mesh, dev)
    _, m8 = jax.jit(step_fn)(state8, dev8)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)


def test_spatial_mesh_matches_single_device(exp_cfg):
    """One jitted train step on a 2-D (data=4, space=2) mesh — image
    height sharded through every conv (XLA halo exchange) and the LSTM
    state table — gives the single-device loss."""
    from leod_tpu.data.loader import (StreamTrainLoader, harvest_frames,
                                      open_split_sequences)
    from leod_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS, shard_batch
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import make_train_step

    cfg = exp_cfg
    trainer = Trainer(cfg, dtype=jnp.float32)
    seqs = open_split_sequences(cfg.dataset, "train")
    loader = StreamTrainLoader(seqs, cfg.dataset, 8, seed=0)
    batch = next(iter(loader))
    hb = harvest_frames(batch, 2, cfg.model.head.max_gt, (64, 96))
    dev = {k: hb[k] for k in ("ev", "is_first", "frame_t", "frame_mask",
                              "labels")}
    optimizer, _ = make_optimizer(cfg.training)
    step_fn = make_train_step(trainer.det, optimizer)

    state1 = trainer.init_state(8, seed=0)
    _, m1 = jax.jit(step_fn)(state1, dev)

    mesh = make_mesh(space=2)
    assert mesh.shape == {DATA_AXIS: 4, SPACE_AXIS: 2}
    trainer2 = Trainer(cfg, dtype=jnp.float32, mesh=mesh)
    trainer2.det = trainer.det
    state2 = trainer2._place(trainer.init_state(8, seed=0))
    # state table carries the (data, space) sharding into the scan
    assert state2.states[0][0].sharding.spec[:2] == (DATA_AXIS, SPACE_AXIS)
    assert len(state2.states[0][0].sharding.device_set) == 8
    dev2 = shard_batch(mesh, dev)
    assert dev2["ev"].sharding.spec[2] == SPACE_AXIS
    new_state, m2 = jax.jit(step_fn)(state2, dev2)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # updated state table keeps both shard axes (no silent replication)
    assert len(new_state.states[0][0].sharding.device_set) == 8


def test_spatial_mesh_fit_and_eval(exp_cfg):
    """Full fit + streaming eval over the (data, space) mesh; eval
    metrics match the 1-device evaluation exactly."""
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.trainer import run_streaming_eval

    mesh = make_mesh(space=2)
    trainer = Trainer(exp_cfg, dtype=jnp.float32, mesh=mesh)
    state = trainer.fit(max_steps=2)
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.variables["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))

    det = Detector(exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    kw = dict(split="train", batch_size=2, frames_per_slot=4,
              shard_index=0, num_shards=1)
    m_single = run_streaming_eval(det, variables, exp_cfg, **kw)
    m_mesh = run_streaming_eval(det, variables, exp_cfg,
                                mesh=make_mesh(4, space=2), **kw)
    for k, v in m_single.items():
        np.testing.assert_allclose(m_mesh[k], v, rtol=1e-6,
                                   err_msg=f"metric {k}")


def test_mesh_eval_matches_single_device(exp_cfg):
    """run_streaming_eval over a device mesh (batch rows + LSTM state
    table sharded) reproduces the single-device metrics exactly."""
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.trainer import run_streaming_eval

    det = Detector(exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    kw = dict(split="train", batch_size=2, frames_per_slot=4,
              shard_index=0, num_shards=1)
    m_single = run_streaming_eval(det, variables, exp_cfg, **kw)
    m_mesh = run_streaming_eval(det, variables, exp_cfg,
                                mesh=make_mesh(2), **kw)
    assert m_single is not None and m_mesh is not None
    for k, v in m_single.items():
        np.testing.assert_allclose(m_mesh[k], v, rtol=1e-6,
                                   err_msg=f"metric {k}")


def test_mesh_eval_falls_back_when_batch_too_small(exp_cfg):
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.trainer import run_streaming_eval

    det = Detector(exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    # 2 sequences < 8 devices: silently falls back to unsharded eval
    m = run_streaming_eval(det, variables, exp_cfg, split="train",
                           batch_size=2, frames_per_slot=4,
                           shard_index=0, num_shards=1, mesh=make_mesh())
    assert m is not None and np.isfinite(m["AP"])


def test_param_spec_rules():
    """Tensor-parallel placement rules fire on the param paths (and the
    mirrored optax mu/nu paths) and nowhere else."""
    from jax.sharding import PartitionSpec as P

    from leod_tpu.parallel.mesh import MODEL_AXIS, param_spec

    def spec(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        assert len(flat) == 1
        return param_spec(flat[0][0])

    qkv = {"backbone": {"stage2": {"block0_window": {"attn": {"qkv": {
        "kernel": 0}}}}}}
    assert spec(qkv) == P(None, MODEL_AXIS)
    proj = {"stage1": {"block0_grid": {"attn": {"proj": {"kernel": 0}}}}}
    assert spec(proj) == P(MODEL_AXIS, None)
    mlp_in = {"block0_grid": {"mlp": {"proj_in": {"bias": 0}}}}
    assert spec(mlp_in) == P(MODEL_AXIS)
    mlp_out = {"block0_grid": {"mlp": {"proj_out": {"kernel": 0}}}}
    assert spec(mlp_out) == P(MODEL_AXIS, None)
    # replicated: attention out-proj bias, convs, norms, LSTM
    assert spec({"attn": {"proj": {"bias": 0}}}) == P()
    assert spec({"down": {"conv": {"kernel": 0}}}) == P()
    assert spec({"lstm": {"gates": {"kernel": 0}}}) == P()
    assert spec({"norm1": {"scale": 0}}) == P()


def test_tensor_parallel_matches_single_device(exp_cfg):
    """One jitted train step on a (data=4, model=2) mesh — attention
    heads + MLP inner dim sharded via param placement, GSPMD inserting
    the block all-reduces — gives the single-device loss."""
    from leod_tpu.data.loader import (StreamTrainLoader, harvest_frames,
                                      open_split_sequences)
    from leod_tpu.parallel.mesh import MODEL_AXIS, shard_batch
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import make_train_step

    cfg = exp_cfg
    trainer = Trainer(cfg, dtype=jnp.float32)
    seqs = open_split_sequences(cfg.dataset, "train")
    loader = StreamTrainLoader(seqs, cfg.dataset, 8, seed=0)
    batch = next(iter(loader))
    hb = harvest_frames(batch, 2, cfg.model.head.max_gt, (64, 96))
    dev = {k: hb[k] for k in ("ev", "is_first", "frame_t", "frame_mask",
                              "labels")}
    optimizer, _ = make_optimizer(cfg.training)
    step_fn = make_train_step(trainer.det, optimizer)

    state1 = trainer.init_state(8, seed=0)
    _, m1 = jax.jit(step_fn)(state1, dev)

    mesh = make_mesh(model=2)
    assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    trainer_tp = Trainer(cfg, dtype=jnp.float32, mesh=mesh)
    trainer_tp.det = trainer.det
    state_tp = trainer_tp._place(trainer.init_state(8, seed=0))
    # qkv column-parallel, out-proj row-parallel; optax moments follow
    qkv = state_tp.variables["params"]["backbone"]["stage1"][
        "block0_window"]["attn"]["qkv"]["kernel"]
    assert tuple(qkv.sharding.spec)[:2] == (None, MODEL_AXIS)
    proj = state_tp.variables["params"]["backbone"]["stage1"][
        "block0_window"]["attn"]["proj"]["kernel"]
    assert tuple(proj.sharding.spec)[0] == MODEL_AXIS
    mu_qkv = state_tp.opt_state[1][0].mu["backbone"]["stage1"][
        "block0_window"]["attn"]["qkv"]["kernel"]
    assert tuple(mu_qkv.sharding.spec)[:2] == (None, MODEL_AXIS)
    dev_tp = shard_batch(mesh, dev)
    new_state, m_tp = jax.jit(step_fn)(state_tp, dev_tp)
    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    # gradients/updates keep the TP sharding (no silent replication)
    new_qkv = new_state.variables["params"]["backbone"]["stage1"][
        "block0_window"]["attn"]["qkv"]["kernel"]
    assert not new_qkv.sharding.is_fully_replicated


def test_3d_mesh_fit_and_eval(exp_cfg):
    """Full fit + streaming eval over the 3-D (data, space, model) mesh;
    eval metrics match the 1-device run exactly."""
    from leod_tpu.models.detector import Detector
    from leod_tpu.parallel.mesh import MODEL_AXIS, SPACE_AXIS
    from leod_tpu.train.trainer import run_streaming_eval

    mesh = make_mesh(space=2, model=2)
    assert mesh.shape == {DATA_AXIS: 2, SPACE_AXIS: 2, MODEL_AXIS: 2}
    trainer = Trainer(exp_cfg, dtype=jnp.float32, mesh=mesh)
    state = trainer.fit(max_steps=2)
    assert int(state.step) == 2
    assert state.states[0][0].sharding.spec[:2] == (DATA_AXIS, SPACE_AXIS)
    for leaf in jax.tree.leaves(state.variables["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))

    det = Detector(exp_cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    kw = dict(split="train", batch_size=2, frames_per_slot=4,
              shard_index=0, num_shards=1)
    m_single = run_streaming_eval(det, variables, exp_cfg, **kw)
    m_mesh = run_streaming_eval(det, variables, exp_cfg,
                                mesh=make_mesh(2, model=2), **kw)
    for k, v in m_single.items():
        np.testing.assert_allclose(m_mesh[k], v, rtol=1e-6,
                                   err_msg=f"metric {k}")


def test_spatial_mesh_gen4_flavor(tmp_path_factory):
    """Spatial sharding at gen4 flavor (ds2 dataset, 3 classes, height
    shard across the gen4-style resolution) — the 1Mpx activation-memory
    use case the space axis exists for. One jitted fit step must run and
    keep the (data, space) sharding on the state table."""
    from leod_tpu.parallel.mesh import SPACE_AXIS

    root = tmp_path_factory.mktemp("synth_sp4")
    generate_dataset(str(root), num_train=2, num_val=0, num_test=0,
                     num_reprs=24, hw=(96, 128), ds2=True, num_classes=3,
                     label_every=2, first_label_repr=11)
    dst = dataclasses.replace(
        dataset_preset("gen4"), path=str(root), resolution_hw=(96, 128),
        sequence_length=4, train_sampling="stream")
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 64),
                                partition_size=(2, 2)),
        head=HeadConfig(num_classes=3, max_gt=8))
    training = TrainingConfig(max_steps=1, batch_size_train=4,
                              batch_size_eval=4, val_check_interval=0,
                              max_det_frames=2, learning_rate=1e-4)
    cfg = ExperimentConfig(dataset=dst, model=model, training=training,
                           save_dir=str(tmp_path_factory.mktemp("runs_sp4")),
                           exp_name="sp4")
    trainer = Trainer(cfg, dtype=jnp.float32, mesh=make_mesh(space=2))
    state = trainer.fit(max_steps=1)
    assert int(state.step) == 1
    assert state.states[0][0].sharding.spec[:2] == (DATA_AXIS, SPACE_AXIS)
    for leaf in jax.tree.leaves(state.variables["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))
