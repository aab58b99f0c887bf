#!/usr/bin/env python
"""Streaming evaluation CLI (reference entry point: val.py).

Examples:
    python cli/val.py --dataset gen1 --path ./datasets/gen1 --ckpt runs/x/ckpt_best
    python cli/val.py --synthetic --size tiny --ckpt runs/smoke/ckpt_last
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
    ap.add_argument("--split", default="test", choices=["val", "test"])
    ap.add_argument("--ckpt", default=None, help="checkpoint dir to load")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference PyTorch .ckpt/.pth to convert and load")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--conf", type=float, default=0.001,
                    help="final-eval confidence threshold (BASELINE.md)")
    ap.add_argument("--reverse", action="store_true",
                    help="evaluate time-reversed sequences (val.py:57-59)")
    ap.add_argument("--eval-ratio", type=float, default=-1.0,
                    help="every-k subsample of the eval split to speed up "
                         "the pass (reference val_ratio/test_ratio)")
    ap.add_argument("--tta", action="store_true",
                    help="h-flip + t-flip test-time augmentation")
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
    from leod_tpu.train.trainer import Trainer, run_streaming_eval

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
    if args.eval_ratio > 0:
        dst = dataclasses.replace(dst, val_ratio=args.eval_ratio,
                                  test_ratio=args.eval_ratio)
    tr = cfg.training
    if args.batch_size:
        tr = dataclasses.replace(tr, batch_size_eval=args.batch_size)
    cfg = derive(dataclasses.replace(cfg, dataset=dst, training=tr))

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    det = Detector(cfg.model, dtype=dtype)
    if args.ckpt:
        # skip the model-sized jitted init: the checkpoint carries the
        # full variables tree (trainer.load_variables owns the mapping)
        from leod_tpu.train.trainer import load_variables
        variables = load_variables(args.ckpt)
    elif args.torch_ckpt:
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        from leod_tpu.convert import check_compatible, load_torch_checkpoint
        converted = load_torch_checkpoint(args.torch_ckpt)
        check_compatible(converted, jax.device_get(variables))
        variables = jax.device_put(converted)
    if args.tta:
        from leod_tpu.eval.tta import run_tta_eval
        metrics = run_tta_eval(det, variables, cfg, split=args.split,
                               conf_threshold=args.conf)
    else:
        metrics = run_streaming_eval(det, variables, cfg, split=args.split,
                                     conf_threshold=args.conf,
                                     time_flip=args.reverse)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
