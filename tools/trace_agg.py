#!/usr/bin/env python
"""Capture a jax.profiler trace of a flagship loop (inference or train,
gen1 or gen4) and aggregate device-lane op durations.

Per CLAUDE.md: isolated-component scan timings carry a fixed layout-copy
overhead at the loop boundary, so the only trustworthy attribution is a
real device trace of the full step. This automates the capture +
aggregation: prints total device time per fused-op category and the top
individual ops, per iteration of the exact benched program.

Usage: python tools/trace_agg.py [out_dir]
Env: PROF_DATASET (gen1|gen4), PROF_MODE (infer|train),
     PROF_BATCH (16 infer / 8 train), PROF_SEQ_LEN (recipe L),
     PROF_ITERS (8), PROF_SIZE (base), BENCH_REMAT (full, train mode)
"""
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# the axon plugin forces jax_platforms=axon,cpu at interpreter start; a
# JAX_PLATFORMS env request (e.g. the CPU CI smoke) must be re-applied
# through jax.config to actually take effect (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# the train-step compile at recipe scale is tens of minutes over the
# tunnel; persist it so an interrupted capture doesn't pay it twice
from leod_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def capture(out_dir: str):
    import bench
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector

    dataset = os.environ.get("PROF_DATASET", "gen1")
    mode = os.environ.get("PROF_MODE", "infer")
    iters = int(os.environ.get("PROF_ITERS", "8"))
    cfg = experiment_preset(dataset, os.environ.get("PROF_SIZE", "base"))
    L = int(os.environ.get("PROF_SEQ_LEN",
                           str(cfg.dataset.sequence_length)))
    if L != cfg.dataset.sequence_length:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset,
                                             sequence_length=L))
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    if mode == "train":
        # the exact benched train step; no carry bump needed — params
        # change every iteration, nothing is loop-invariant (CLAUDE.md)
        from leod_tpu.train.step import make_train_step

        B = int(os.environ.get("PROF_BATCH", "8"))
        remat = os.environ.get("BENCH_REMAT", "full")
        state, batch, optimizer = bench.build_train_setup(
            cfg, det, B=B, variables=variables)
        step_fn = make_train_step(det, optimizer, remat=remat)

        def run_iters(state, batch):
            def body(s, _):
                s, metrics = step_fn(s, batch)
                return s, metrics["loss"]
            s, losses = jax.lax.scan(body, state, None, length=iters)
            return losses, s

        run_iters = jax.jit(run_iters)
        args = (state, batch)
    elif mode == "infer":
        B = int(os.environ.get("PROF_BATCH", "16"))
        infer = bench.build_infer(det)    # the exact benched program

        def run_iters(variables, ev, states):
            def body(carry, _):
                bump = (carry[0][0][0, 0, 0, 0] > 0).astype(det.dtype)
                preds, states = infer(variables, ev, carry, bump)
                return states, preds[0, 0, 0]
            states, outs = jax.lax.scan(body, states, None, length=iters)
            return outs, states

        run_iters = jax.jit(run_iters)
        args = (variables, bench.make_ev(cfg, B, L), det.init_states(B))
    else:
        raise SystemExit(f"PROF_MODE={mode!r}: expected infer|train")

    print(f"workload: {dataset} {mode} B={B} L={L} x{iters} iters")
    outs, _ = run_iters(*args)                       # compile
    outs.block_until_ready()

    with jax.profiler.trace(out_dir):
        outs, _ = run_iters(*args)
        outs.block_until_ready()
    return iters * L, iters


def categorize(name: str) -> str:
    n = name.lower()
    if "fusion" in n and ("conv" in n or "dot" in n or "gemm" in n):
        return "gemm/conv fusion"
    if n.startswith("%convolution") or n.startswith("convolution"):
        return "convolution"
    if n.startswith("%dot") or "dot." in n or n.startswith("dot"):
        return "dot"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout copy/transpose"
    if "reduce" in n or "convert" in n:
        return "reduce/convert"
    if "fusion" in n:
        return "other fusion"
    if "dynamic" in n or "slice" in n or "scatter" in n or "gather" in n:
        return "slice/gather"
    return "misc"


def aggregate(out_dir: str, steps: int):
    from leod_tpu.utils.trace import is_scan_wrapper, load_device_events

    path, pid_names, dev_events = load_device_events(out_dir)
    assert path, f"no trace under {out_dir}"
    by_op = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    loop_total = 0.0
    for e in dev_events:
        name = e.get("name", "?")
        if "XLA Modules" in str(pid_names.get(e.get("pid"), "")):
            continue
        dur = e.get("dur", 0) / 1e3            # us -> ms
        if is_scan_wrapper(name):
            # scan wrapper rows CONTAIN the inner ops (CLAUDE.md): keep
            # them out of the per-op totals and report separately as the
            # real loop time
            loop_total += dur
            continue
        by_op[name] += dur
        by_cat[categorize(name)] += dur
        total += dur
    print(f"trace: {path}")
    print(f"device op time total: {total:.2f} ms over {steps} frames "
          f"-> {total / steps:.3f} ms/frame-step")
    if loop_total:
        print(f"scan-wrapper (while) rows: {loop_total:.2f} ms — the real "
              f"loop total; inner-op sum above excludes them")
    print()
    print("== by category ==")
    for cat, ms in by_cat.most_common():
        print(f"{ms:9.2f} ms  {ms / total * 100:5.1f}%  {cat}")
    print("\n== top 30 ops ==")
    for name, ms in by_op.most_common(30):
        print(f"{ms:9.2f} ms  {ms / total * 100:5.1f}%  {name[:110]}")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/leod_trace"
    os.makedirs(out_dir, exist_ok=True)
    steps, _ = capture(out_dir)
    time.sleep(1)
    aggregate(out_dir, steps)


if __name__ == "__main__":
    main()
