#!/usr/bin/env python
"""Pseudo-label dataset generation CLI (reference entry point: predict.py).

Runs the teacher over the training split, writes a new pseudo-labeled
dataset, verifies its structural integrity, and scores the generated
labels against withheld GT (the reference chains val_dst.py; here both
passes are built in).

Example:
    python cli/predict.py --dataset gen1 --path ./datasets/gen1 \
        --ckpt runs/teacher/ckpt_best --ratio 0.05 \
        --save-dir ./datasets/pseudo/gen1_x0.05_ss --tta-hflip --tta-tflip
"""
import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base", choices=["tiny", "small", "base"])
    ap.add_argument("--path", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--ratio", type=float, default=-1.0,
                    help="WSOD: teacher was trained on labels at this ratio")
    ap.add_argument("--train-ratio", type=float, default=-1.0,
                    help="SSOD: teacher saw this fraction of sequences")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--obj-thresh", type=float, nargs="+", default=[0.6, 0.3])
    ap.add_argument("--cls-thresh", type=float, nargs="+", default=[0.6, 0.3])
    ap.add_argument("--min-track-len", type=int, default=6)
    ap.add_argument("--no-inpaint", action="store_true")
    ap.add_argument("--track-method", default="forward or backward",
                    choices=["forward", "forward or backward"])
    ap.add_argument("--skip-first-t", type=int, default=0)
    ap.add_argument("--tta-hflip", action="store_true")
    ap.add_argument("--tta-tflip", action="store_true")
    ap.add_argument("--no-use-gt", action="store_true")
    ap.add_argument("--tracking-only", action="store_true",
                    help="re-run the track filter over an existing pseudo "
                         "dataset at --path (no model inference)")
    ap.add_argument("--conf", type=float, default=0.1)
    ap.add_argument("--verify-frac", type=float, default=0.1)
    ap.add_argument("--shard-index", type=int, default=0,
                    help="sequence shard this process generates (pseudo-gen "
                         "is embarrassingly shardable; run one process per "
                         "shard into the same --save-dir, then verify once)")
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from leod_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from leod_tpu.config import derive, experiment_preset
    from leod_tpu.data.synthetic import generate_dataset
    from leod_tpu.models.detector import Detector
    from leod_tpu.selftrain.pseudo_labeler import PseudoLabelConfig
    from leod_tpu.selftrain.runner import PseudoLabelRunner
    from leod_tpu.selftrain.verify import (score_pseudo_dataset,
                                           verify_pseudo_dataset)

    cfg = experiment_preset(args.dataset, args.size)
    dst = cfg.dataset
    if args.synthetic:
        root = args.path or tempfile.mkdtemp(prefix="leod_synth_")
        if not os.path.isdir(os.path.join(root, "train")):
            generate_dataset(root, num_train=4, num_val=2, num_test=2,
                             num_reprs=64)
        dst = dataclasses.replace(dst, path=root)
    elif args.path:
        dst = dataclasses.replace(dst, path=args.path)
    if args.seq_len:
        dst = dataclasses.replace(dst, sequence_length=args.seq_len)
    dst = dataclasses.replace(dst, ratio=args.ratio,
                              train_ratio=args.train_ratio)
    tr = cfg.training
    if args.batch_size:
        tr = dataclasses.replace(tr, batch_size_eval=args.batch_size)
    cfg = derive(dataclasses.replace(cfg, dataset=dst, training=tr))

    from leod_tpu.config import broadcast_gen4_thresholds
    obj_t = broadcast_gen4_thresholds(tuple(args.obj_thresh), args.dataset)
    cls_t = broadcast_gen4_thresholds(tuple(args.cls_thresh), args.dataset)
    pl_cfg = PseudoLabelConfig(
        skip_first_t=args.skip_first_t, obj_thresh=obj_t, cls_thresh=cls_t,
        min_track_len=args.min_track_len, track_method=args.track_method,
        inpaint=not args.no_inpaint, tta_hflip=args.tta_hflip,
        tta_tflip=args.tta_tflip, use_gt=not args.no_use_gt)
    pp = dataclasses.replace(cfg.model.postprocess,
                             confidence_threshold=args.conf)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, postprocess=pp))

    if args.tracking_only:
        from leod_tpu.selftrain.pseudo_labeler import rerun_track_filter
        n = rerun_track_filter(dst.path, args.save_dir, dst, pl_cfg)
        print(f"re-filtered {n} sequences into {args.save_dir}")
        return

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    det = Detector(cfg.model, dtype=dtype)
    if args.ckpt:
        # skip the model-sized jitted init: the checkpoint carries the
        # full variables tree (trainer.load_variables owns the mapping)
        from leod_tpu.train.trainer import load_variables
        variables = load_variables(args.ckpt)
    else:
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    runner = PseudoLabelRunner(det, variables, cfg, pl_cfg, args.save_dir,
                               shard_index=args.shard_index,
                               num_shards=args.num_shards)
    metrics = runner.run()
    print("teacher quality:", json.dumps(metrics, indent=2, default=float))

    if args.num_shards > 1:
        # dataset verification + scoring need the union of all shards;
        # run them once after the last shard finishes (cli/val_dst.py)
        print(f"shard {args.shard_index}/{args.num_shards} done; "
              f"verify the merged dataset with cli/val_dst.py once all "
              f"shards have finished")
        return
    n = verify_pseudo_dataset(args.save_dir, dst,
                              sample_frac=args.verify_frac,
                              use_gt=pl_cfg.use_gt)
    print(f"verified {n} generated sequences: OK")
    score = score_pseudo_dataset(args.save_dir, dst, pl_cfg,
                                 cfg.model.head.num_classes, dst.classes)
    print("label-quality vs withheld GT:",
          json.dumps(score, indent=2, default=float))


if __name__ == "__main__":
    main()
