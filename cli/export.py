#!/usr/bin/env python
"""AOT-export a trained detector to a self-contained serving artifact.

The artifact is serialized StableHLO (jax.export) with the weights baked
in as constants: a serving process deserializes and runs it without the
model code or checkpoint (leod_tpu/serve.py, cli/serve.py). The
reference has no equivalent — its inference entry points re-instantiate
the torch model from a checkpoint every time (reference: val.py:30-60).

Examples:
    python cli/export.py --dataset gen1 --ckpt runs/x/ckpt_best \\
        --batch-size 16 --out model_gen1.stablehlo
    python cli/export.py --synthetic --size tiny --cpu \\
        --out /tmp/tiny.stablehlo            # smoke-export random init
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base", choices=["tiny", "small", "base"])
    ap.add_argument("--ckpt", default=None, help="checkpoint dir to export")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference PyTorch .ckpt/.pth to convert and export")
    ap.add_argument("--synthetic", action="store_true",
                    help="export a random init (smoke/testing)")
    ap.add_argument("--batch-size", type=int, default=16,
                    help="stream slots the compiled program serves")
    ap.add_argument("--conf", type=float, default=None,
                    help="confidence threshold baked into postprocess "
                         "(default: the config's)")
    ap.add_argument("--raw-layout", action="store_true",
                    help="take raw [B,H,W,C] frames instead of the "
                         "host-prefolded space-to-depth layout")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: current backend)")
    ap.add_argument("--out", required=True,
                    help="output path (.stablehlo; writes <out>.json too)")
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
    from leod_tpu.models.detector import Detector
    from leod_tpu.serve import (artifact_meta, export_serve_step,
                                save_artifact)

    if not (args.ckpt or args.torch_ckpt or args.synthetic):
        ap.error("need --ckpt, --torch-ckpt, or --synthetic")

    cfg = derive(experiment_preset(args.dataset, args.size))
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

    fold = not args.raw_layout
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    exported = export_serve_step(det, variables, cfg, args.batch_size,
                                 fold=fold, conf_threshold=args.conf,
                                 platforms=platforms)
    meta = artifact_meta(cfg, args.batch_size, fold, args.conf)
    save_artifact(exported, args.out, meta)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {args.dataset}/{args.size} B={args.batch_size} "
          f"fold={fold} -> {args.out} ({size_mb:.1f} MB) + .json")


if __name__ == "__main__":
    main()
