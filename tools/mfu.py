#!/usr/bin/env python
"""Model-FLOPs-utilization (MFU) for the flagship inference + train
workloads.

FLOP counts come from XLA's own cost analysis of the compiled
executables (jax Compiled.cost_analysis), so they track the model
exactly; the workloads are bench.py's own builders, so this tool and
the throughput bench measure the same program. Timing here is a host
loop over the compiled executable (cross-call hoisting is impossible,
so no carry bump is needed; per-call dispatch latency slightly
understates MFU through the remote-TPU tunnel). Peak is the v5e bf16
MXU figure by default (override PEAK_TFLOPS for other parts).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e bf16


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):                 # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def _report(name, compiled, args, iters):
    fl = _flops(compiled)
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    tfs = fl / dt / 1e12
    print(f"{name}: {fl / 1e9:.1f} GFLOP, {dt * 1e3:.1f} ms -> "
          f"{tfs:.2f} TFLOP/s = {tfs / PEAK_TFLOPS * 100:.1f}% MFU")


def main():
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.step import make_train_step

    cfg = experiment_preset("gen1", "base")
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    B, L = 16, cfg.dataset.sequence_length
    infer = bench.build_infer(det)
    ev = bench.make_ev(cfg, B, L)
    states = det.init_states(B)
    zero = jnp.zeros((), det.dtype)
    compiled = jax.jit(infer).lower(variables, ev, states, zero).compile()
    _report(f"inference window (B={B}, L={L})", compiled,
            (variables, ev, states, zero), iters=10)

    # train step at the Gen1 recipe
    remat = os.environ.get("BENCH_REMAT", "full")
    state, batch, optimizer = bench.build_train_setup(cfg, det, B=8,
                                                      variables=variables)
    step_fn = make_train_step(det, optimizer, remat=remat)
    compiled = jax.jit(step_fn).lower(state, batch).compile()
    _report(f"train step (bs=8, L={L}, remat={remat})", compiled,
            (state, batch), iters=6)


if __name__ == "__main__":
    main()
