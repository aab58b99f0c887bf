#!/usr/bin/env python
"""Train-step throughput sweep (remat policy x batch size) on the chip.

Runs bench.py's exact train-step program (build_train_setup +
make_train_step + on-device lax.scan repeat loop) for each requested
config and prints one JSON line per config plus a summary table. Used
for the per-dataset TBPTT tuning tables in docs/benchmarks.md (the
reference has no equivalent: its only training-throughput knob is
batch size, docs/benchmark.md:58-68).

Each config runs in a FRESH subprocess: "store residuals" remat
policies can crash the TPU compile helper at full-footprint shapes
(docs/benchmarks.md, gen1 L=21), and a crashed config must not take
the sweep down with it. Configs run sequentially — only one TPU client
may exist at a time (CLAUDE.md) — with a generous per-config timeout
(gen4 compiles take minutes through the remote tunnel).

Usage:
  python tools/sweep_train.py --dataset gen4 --remat full,dots,stage1,none
  python tools/sweep_train.py --dataset gen4 --remat full --batches 8,12,16
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(dataset: str, size: str, remat: str, B: int, L: int,
            iters: int):
    import jax

    # the axon plugin forces jax_platforms=axon,cpu at interpreter
    # start; a JAX_PLATFORMS env request (e.g. the CPU smoke) must be
    # re-applied through jax.config to take effect (CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    import bench
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.step import make_train_step

    cfg = experiment_preset(dataset, size)
    if L:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset,
                                             sequence_length=L))
    L = cfg.dataset.sequence_length
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    state, batch, optimizer = bench.build_train_setup(cfg, det, B=B,
                                                      variables=variables)
    train_step = make_train_step(det, optimizer, remat=remat)

    def run(state, ev):
        # params update every iteration -> nothing is loop-invariant;
        # no input bump needed (CLAUDE.md)
        def body(carry, _):
            st, metrics = train_step(carry, {**batch, "ev": ev})
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=iters)

    run = jax.jit(run)
    out = run(state, batch["ev"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(state, batch["ev"])
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"dataset": dataset, "remat": remat, "B": B,
                      "L": L, "ms_per_step": round(ms, 2),
                      "frames_per_s": round(B * L / ms * 1e3, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen4")
    ap.add_argument("--size", default="base")
    ap.add_argument("--remat", default="full")
    ap.add_argument("--batches", default="8")
    ap.add_argument("--seq-len", type=int, default=0,
                    help="override the recipe sequence length")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=1200,
                    help="per-config subprocess budget (s)")
    ap.add_argument("--one", action="store_true",
                    help="internal: run a single config in-process")
    args = ap.parse_args()

    if args.one:
        run_one(args.dataset, args.size, args.remat.split(",")[0],
                int(args.batches.split(",")[0]), args.seq_len, args.iters)
        return

    rows = []
    for remat in args.remat.split(","):
        for b in args.batches.split(","):
            cmd = [sys.executable, os.path.abspath(__file__), "--one",
                   "--dataset", args.dataset, "--size", args.size,
                   "--remat", remat, "--batches", b,
                   "--seq-len", str(args.seq_len),
                   "--iters", str(args.iters)]
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.timeout, cwd=REPO)
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("{")]
                if p.returncode == 0 and line:
                    rows.append(json.loads(line[-1]))
                else:
                    rows.append({"dataset": args.dataset, "remat": remat,
                                 "B": int(b), "error":
                                 f"rc={p.returncode}: "
                                 + p.stderr.strip().splitlines()[-1][:200]
                                 if p.stderr.strip() else
                                 f"rc={p.returncode}"})
            except subprocess.TimeoutExpired:
                rows.append({"dataset": args.dataset, "remat": remat,
                             "B": int(b), "error": "timeout"})
            print(json.dumps(rows[-1]), flush=True)
    print(f"\n{'remat':>8} {'B':>4} {'ms/step':>9} {'frames/s':>9}")
    for r in rows:
        if "error" in r:
            print(f"{r['remat']:>8} {r['B']:>4}  {r['error']}")
        else:
            print(f"{r['remat']:>8} {r['B']:>4} {r['ms_per_step']:>9} "
                  f"{r['frames_per_s']:>9}")


if __name__ == "__main__":
    main()
