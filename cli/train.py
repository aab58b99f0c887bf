#!/usr/bin/env python
"""Train CLI (reference entry point: train.py).

Examples:
    python cli/train.py --dataset gen1 --size base --path ./datasets/gen1
    python cli/train.py --synthetic --size tiny --steps 50   # smoke test
"""
import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base", choices=["tiny", "small", "base"])
    ap.add_argument("--path", default=None, help="dataset root")
    ap.add_argument("--synthetic", action="store_true",
                    help="generate a tiny synthetic dataset and train on it")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--warmup-pct", type=float, default=None,
                    help="OneCycle warmup fraction (default 0.005)")
    ap.add_argument("--sampling", default=None,
                    choices=["random", "stream", "mixed"])
    ap.add_argument("--ratio", type=float, default=-1.0,
                    help="WSOD label-frequency subsample ratio")
    ap.add_argument("--tflip", action="store_true",
                    help="enable temporal-flip augmentation (prob 0.5 on "
                         "both samplers), as every reference WSOD/self-"
                         "training dataset config does (gen1-tflip.yaml, "
                         "gen1x*.yaml data_augmentation.*.prob_tflip)")
    ap.add_argument("--train-ratio", type=float, default=-1.0,
                    help="SSOD sequence subsample ratio")
    ap.add_argument("--soft", action="store_true",
                    help="self-training student config (ignore_bbox_thresh)")
    ap.add_argument("--ssod-online", action="store_true",
                    help="online SSOD: EMA teacher on weak views "
                         "pseudo-labels strong views in-loop "
                         "(selftrain/online.py)")
    ap.add_argument("--ssod-alpha", type=float, default=0.999,
                    help="EMA decay for the online teacher")
    ap.add_argument("--ssod-burn-in", type=int, default=0,
                    help="GT-only steps before pseudo labels merge")
    ap.add_argument("--ssod-thresh", type=float, nargs=2, default=(0.7, 0.7),
                    metavar=("OBJ", "CLS"),
                    help="teacher obj/cls confidence thresholds")
    ap.add_argument("--ssod-update", default="ema",
                    help="teacher update: 'ema' or 'every-N'")
    ap.add_argument("--save-dir", default="./runs")
    ap.add_argument("--exp-name", default="leod_tpu")
    ap.add_argument("--val-every", type=int, default=None)
    ap.add_argument("--ckpt-every-min", type=float, default=None,
                    help="time-triggered checkpoint cadence in minutes "
                         "(default 18; reference timer). Raise above the "
                         "run length to skip mid-run saves — fit() always "
                         "writes ckpt_last at the end")
    ap.add_argument("--max-det-frames", type=int, default=None,
                    help="per-slot labeled-frame harvest budget")
    ap.add_argument("--weight", default=None, help="weight-only init ckpt")
    ap.add_argument("--torch-weight", default=None,
                    help="reference PyTorch .ckpt/.pth to convert for "
                         "weight-only init (e.g. a reference teacher)")
    ap.add_argument("--checkpoint", default=None, help="full-state resume")
    ap.add_argument("--auto-resume", action="store_true",
                    help="resume from the newest checkpoint in the run dir")
    ap.add_argument("--profile-steps", type=int, default=0,
                    help="capture a jax.profiler trace of N steps")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--mesh", default=None, metavar="DP[xSP[xTP]]",
                    help="device mesh: '8' = 8-way data parallel, "
                         "'4x2' = 4-way data x 2-way spatial (image "
                         "height sharded), '2x2x2' adds 2-way tensor "
                         "parallelism (attention heads + MLP inner dim; "
                         "parallel/mesh.py)")
    ap.add_argument("--wandb-project", default=None,
                    help="also stream metrics to WandB (requires the "
                         "wandb package; reference: loggers/utils.py)")
    ap.add_argument("--gradflow", action="store_true",
                    help="log per-PARAMETER mean |grad| every log interval "
                         "(reference gradflow charts, callbacks/gradflow.py)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from leod_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from leod_tpu.config import derive, experiment_preset
    from leod_tpu.data.synthetic import generate_dataset
    from leod_tpu.train.trainer import Trainer

    cfg = experiment_preset(args.dataset, args.size, soft=args.soft)
    dst = cfg.dataset
    if args.synthetic:
        root = args.path or tempfile.mkdtemp(prefix="leod_synth_")
        if not os.path.isdir(os.path.join(root, "train")):
            print(f"generating synthetic dataset at {root}")
            generate_dataset(root, num_train=4, num_val=2, num_test=2,
                             num_reprs=64, seed=args.seed)
        dst = dataclasses.replace(dst, path=root)
    elif args.path:
        dst = dataclasses.replace(dst, path=args.path)
    if args.seq_len:
        dst = dataclasses.replace(dst, sequence_length=args.seq_len)
    if args.sampling:
        dst = dataclasses.replace(dst, train_sampling=args.sampling)
    dst = dataclasses.replace(dst, ratio=args.ratio,
                              train_ratio=args.train_ratio)
    if args.tflip:
        dst = dataclasses.replace(
            dst,
            augment_random=dataclasses.replace(dst.augment_random,
                                               prob_tflip=0.5),
            augment_stream=dataclasses.replace(dst.augment_stream,
                                               prob_tflip=0.5))
    tr = cfg.training
    if args.steps:
        tr = dataclasses.replace(tr, max_steps=args.steps)
    if args.batch_size:
        tr = dataclasses.replace(tr, batch_size_train=args.batch_size,
                                 batch_size_eval=args.batch_size)
    if args.lr:
        tr = dataclasses.replace(tr, learning_rate=args.lr)
    if args.warmup_pct is not None:
        tr = dataclasses.replace(tr, lr_scheduler=dataclasses.replace(
            tr.lr_scheduler, pct_start=args.warmup_pct))
    if args.val_every is not None:
        tr = dataclasses.replace(tr, val_check_interval=args.val_every)
    if args.ckpt_every_min is not None:
        tr = dataclasses.replace(tr, ckpt_every_min=args.ckpt_every_min)
    if args.gradflow:
        tr = dataclasses.replace(tr, gradflow=True)
    if args.max_det_frames is not None:
        tr = dataclasses.replace(tr, max_det_frames=args.max_det_frames)
    elif args.soft and cfg.model.use_label_every <= 1:
        # self-training students run on DENSE pseudo datasets: the
        # reference supervises every frame (ragged BackboneFeatureSelector,
        # modules/detection.py:184-234, use_label_every=1 in every soft
        # config), so the static harvest budget must cover the whole
        # window or labeled frames are silently dropped
        tr = dataclasses.replace(tr,
                                 max_det_frames=dst.sequence_length)
    if args.ssod_online:
        tr = dataclasses.replace(tr, ssod_online=dataclasses.replace(
            tr.ssod_online, enabled=True, alpha=args.ssod_alpha,
            update_method=args.ssod_update,
            burn_in_steps=args.ssod_burn_in,
            obj_thresh=args.ssod_thresh[0], cls_thresh=args.ssod_thresh[1]))
    cfg = derive(dataclasses.replace(cfg, dataset=dst, training=tr,
                                     save_dir=args.save_dir,
                                     exp_name=args.exp_name))

    mesh = None
    if args.mesh:
        from leod_tpu.parallel.mesh import make_mesh
        dims = [int(d) for d in args.mesh.split("x")]
        if len(dims) > 3 or any(d < 1 for d in dims):
            raise ValueError(
                f"--mesh {args.mesh!r}: expected 1-3 positive dims "
                f"(DP[xSP[xTP]]) — silently truncating would train at a "
                f"smaller parallel degree than requested")
        dp, sp, tp = (dims + [1, 1])[:3]
        mesh = make_mesh(dp * sp * tp, space=sp, model=tp)
    trainer = Trainer(cfg, dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
                      mesh=mesh)
    if args.wandb_project:
        from leod_tpu.train.trainer import MetricLogger
        try:
            trainer.logger.add_sink(MetricLogger.wandb_sink(
                args.wandb_project, run_name=args.exp_name,
                config={"dataset": args.dataset, "size": args.size}))
        except ImportError:
            print("wandb not installed; continuing with JSONL metrics only")
    # the jitted model+optimizer init is a model-sized compile (~20-40 s
    # on TPU): build ONE template state and thread it through the whole
    # resume chain instead of re-initializing per branch
    state = None
    base = (trainer.init_state(tr.batch_size_train, args.seed)
            if (args.auto_resume or args.checkpoint or args.weight
                or args.torch_weight) else None)
    if args.auto_resume and not args.checkpoint:
        # restore_latest try-restores newest -> oldest so a checkpoint
        # with corrupted PAYLOAD (not just unreadable metadata) also
        # falls back (reference: train.py:85-92); nothing restorable
        # returns (input state, None) and the chain below takes over
        state, latest = trainer.restore_latest(base)
        if latest:
            print(f"auto-resumed from {latest}")
        else:
            state = None
    if state is None and args.checkpoint:
        state = trainer.restore_checkpoint(args.checkpoint, base)
    elif state is None and args.weight:
        state = trainer.load_weights(args.weight, base)
    elif state is None and args.torch_weight:
        from leod_tpu.convert import check_compatible, load_torch_checkpoint
        converted = load_torch_checkpoint(args.torch_weight)
        check_compatible(converted, jax.device_get(base.variables))
        state = base._replace(variables=jax.device_put(converted))
    elif state is None:
        # auto-resume with an empty run dir and no weight flags: reuse
        # the template instead of letting fit() redo the same init
        state = base
    final = trainer.fit(seed=args.seed, state=state,
                        profile_steps=args.profile_steps)
    trainer.close()
    print(f"done at step {int(final.step)}")


if __name__ == "__main__":
    main()
