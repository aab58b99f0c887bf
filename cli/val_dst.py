#!/usr/bin/env python
"""Score a generated pseudo dataset against withheld GT
(reference entry point: val_dst.py).

Example:
    python cli/val_dst.py --dataset gen1 --orig-path ./datasets/gen1 \
        --path ./datasets/pseudo/gen1_x0.05_ss --ratio 0.05
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--path", required=True, help="pseudo dataset root")
    ap.add_argument("--orig-path", required=True, help="original dataset root")
    ap.add_argument("--ratio", type=float, default=-1.0)
    ap.add_argument("--train-ratio", type=float, default=-1.0)
    ap.add_argument("--obj-thresh", type=float, nargs="+", default=[0.6, 0.3])
    ap.add_argument("--cls-thresh", type=float, nargs="+", default=[0.6, 0.3])
    ap.add_argument("--verify", action="store_true",
                    help="also verify structural integrity on all sequences")
    args = ap.parse_args()

    from leod_tpu.config import dataset_preset
    from leod_tpu.selftrain.pseudo_labeler import PseudoLabelConfig
    from leod_tpu.selftrain.verify import (score_pseudo_dataset,
                                           verify_pseudo_dataset)

    dst = dataclasses.replace(dataset_preset(args.dataset),
                              path=args.orig_path, ratio=args.ratio,
                              train_ratio=args.train_ratio)
    from leod_tpu.config import broadcast_gen4_thresholds
    obj_t = broadcast_gen4_thresholds(tuple(args.obj_thresh), args.dataset)
    cls_t = broadcast_gen4_thresholds(tuple(args.cls_thresh), args.dataset)
    pl_cfg = PseudoLabelConfig(obj_thresh=obj_t, cls_thresh=cls_t)
    if args.verify:
        n = verify_pseudo_dataset(args.path, dst, sample_frac=1.0)
        print(f"verified {n} sequences: OK")
    metrics = score_pseudo_dataset(args.path, dst, pl_cfg,
                                   dst.num_classes, dst.classes)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
