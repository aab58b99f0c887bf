"""Multi-process worker for the real-`jax.distributed` smoke test.

Launched by tests/test_multiprocess.py as one of N coordinated
processes, each with 2 virtual CPU devices, forming one global mesh —
the same topology as a real multi-host TPU pod slice (reference runs
DDP across ranks, train.py:126-133). Runs the LIVE paths: Trainer.fit
(per-process loader shard via process_shard/local slot offsets) and
run_streaming_eval (per-process sequence shard + evaluator all-gather),
then dumps losses/metrics to JSON for the parent to cross-check.

Standalone script (bypasses conftest.py): it must set its own
XLA_FLAGS before importing jax.
"""
import dataclasses
import json
import os
import sys


def build_cfg(root: str, runs: str):
    """Shared between the workers and the parent's single-process
    reference run, so losses/metrics are directly comparable."""
    from leod_tpu.config import (BackboneConfig, ExperimentConfig,
                                 HeadConfig, ModelConfig, TrainingConfig,
                                 dataset_preset)
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=root, resolution_hw=(64, 96),
        sequence_length=4, train_sampling="stream")
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=8))
    training = TrainingConfig(max_steps=3, batch_size_train=8,
                              batch_size_eval=4, val_check_interval=0,
                              max_det_frames=2, learning_rate=1e-4,
                              viz_every_steps=0)
    return ExperimentConfig(dataset=dst, model=model, training=training,
                            save_dir=runs, exp_name="mp")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    root = sys.argv[4]
    runs = sys.argv[5]
    out_path = sys.argv[6]
    mode = sys.argv[7] if len(sys.argv) > 7 else "train_eval"

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from leod_tpu.parallel.distributed import maybe_initialize
    maybe_initialize(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    import jax.numpy as jnp
    from leod_tpu.parallel.mesh import make_mesh
    from leod_tpu.train.trainer import Trainer, run_streaming_eval

    cfg = build_cfg(root, runs)
    mesh = make_mesh()
    assert mesh.devices.size == 2 * nproc

    if mode == "ssod":
        # online SSOD under the real multi-controller runtime: the EMA
        # teacher must run on LOCAL devices (its dets are fetched from
        # the prefetch thread) while the student lives replicated on the
        # global mesh — the exact mixed-device-set hazard this mode
        # exercises end-to-end.
        from leod_tpu.config import SSODOnlineConfig
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(
                cfg.training,
                ssod_online=SSODOnlineConfig(
                    enabled=True, burn_in_steps=1, obj_thresh=0.05,
                    cls_thresh=0.05, skip_first_t=1)))
        trainer = Trainer(cfg, dtype=jnp.float32, mesh=mesh)
        state = trainer.fit(max_steps=3, log_every=1)
        assert int(state.step) == 3
        losses = None
        if pid == 0:
            losses = []
            with open(os.path.join(trainer.run_dir,
                                   "metrics.jsonl")) as f:
                for line in f:
                    rec = json.loads(line)
                    if "loss" in rec:
                        losses.append(rec["loss"])
        with open(out_path, "w") as f:
            json.dump({"step": int(state.step), "losses": losses}, f)
        return

    if mode == "preempt":
        # preemption failure-injection: the parent SIGTERMs ONE rank
        # mid-fit; the stop request must propagate through the
        # rank-consistent sync (trainer.fit multihost flags all-gather)
        # so BOTH ranks checkpoint and leave fit at the same step.
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(
                cfg.training, max_steps=500, multihost_sync_every=2))
        trainer = Trainer(cfg, dtype=jnp.float32, mesh=mesh)
        state = trainer.fit(log_every=1)
        step = int(state.step)
        assert step < 500, "fit ran to completion; preemption never landed"
        ckpt = os.path.join(trainer.run_dir, "ckpt_last")
        with open(out_path, "w") as f:
            json.dump({"step": step, "ckpt_exists": os.path.isdir(ckpt)}, f)
        return

    trainer = Trainer(cfg, dtype=jnp.float32, mesh=mesh)
    state = trainer.fit(max_steps=3, log_every=1)
    assert int(state.step) == 3

    # per-step losses from the rank-0 metrics log (log_every=1 above);
    # loss is a replicated scalar so only rank 0 writes it
    losses = None
    if pid == 0:
        losses = []
        with open(os.path.join(trainer.run_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    losses.append(rec["loss"])

    # live sharded streaming eval: each process evaluates its own
    # sequence shard, evaluator buffers are all-gathered, every rank
    # reports identical metrics
    metrics = run_streaming_eval(trainer.det, state.variables, cfg,
                                 split="val", mesh=mesh)
    ckpt = os.path.join(trainer.run_dir, "ckpt_last")
    with open(out_path, "w") as f:
        json.dump({"losses": losses, "metrics": metrics,
                   "ckpt_exists": os.path.isdir(ckpt)}, f)


if __name__ == "__main__":
    main()
