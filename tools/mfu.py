#!/usr/bin/env python
"""Roofline report (MFU + achieved-HBM-bandwidth) for the flagship
inference + train workloads.

FLOP and byte counts come from XLA's own cost analysis of the compiled
executables (jax Compiled.cost_analysis: "flops" and "bytes accessed" —
the sum of HBM operand reads + output writes per fusion after
optimization), so they track the exact compiled program; the workloads
are bench.py's own builders, so this tool and the throughput bench
measure the same thing. Timing is a host loop over the compiled
executable (cross-call hoisting is impossible, so no carry bump is
needed; per-call dispatch latency slightly understates utilization
through the remote-TPU tunnel).

For each workload the report gives both roofs — compute (% of peak
bf16 MXU FLOP/s) and memory (% of peak HBM GB/s) — plus the program's
arithmetic intensity vs the machine balance point, which says WHICH
roof binds. Peaks default to v5e (197 bf16 TFLOP/s, 819 GB/s); override
with PEAK_TFLOPS / PEAK_GBPS for other parts.

CALIBRATION: compiled cost_analysis does NOT multiply rolled-scan
body counts by the trip count (measured: identical FLOP totals for the
train step at L=7/14/21), so the rolled numbers are ~L-fold
undercounts. Both workload rows are therefore re-derived from FULLY
UNROLLED lowerings of the same program at two small window lengths —
no while loop means every op instance is counted (for the train step
that includes the remat recompute and the backward scan); the
difference of the two probes isolates one backbone step and the
residual is the fixed head/loss/optimizer work, extrapolated to the
production L. FLOPs are exact; BYTES are an upper bound (see
calibrated_infer_cost).

Usage: python tools/mfu.py [--dataset gen1|gen4|all] [--iters N]
                           [--no-calibrate] [--json PATH]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e bf16 MXU
PEAK_GBPS = float(os.environ.get("PEAK_GBPS", "819"))      # v5e HBM2E


def _cost(compiled) -> tuple:
    """(flops, hbm_bytes) from XLA cost analysis. Bytes: the top-level
    "bytes accessed" key (total across operands+outputs of every
    fusion); absent on some backends -> 0."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):                 # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))


def _util_block(fl, by, dt, indent="  "):
    """Print + return the roofline numbers for (flops, bytes, seconds)."""
    tfs = fl / dt / 1e12
    gbs = by / dt / 1e9
    ai = fl / by if by else float("inf")     # FLOP per HBM byte
    balance = PEAK_TFLOPS * 1e12 / (PEAK_GBPS * 1e9)
    bound = "compute" if ai >= balance else "memory"
    print(f"{indent}{fl / 1e9:>9.1f} GFLOP  {by / 1e9:>8.2f} GB   "
          f"{dt * 1e3:>7.2f} ms/step")
    print(f"{indent}{tfs:>9.2f} TFLOP/s = {tfs / PEAK_TFLOPS * 100:>5.1f}% "
          f"of MXU peak ({PEAK_TFLOPS:.0f})")
    if by:
        print(f"{indent}{gbs:>9.1f} GB/s    = "
              f"{gbs / PEAK_GBPS * 100:>5.1f}% of HBM peak "
              f"({PEAK_GBPS:.0f})")
        print(f"{indent}intensity {ai:.1f} FLOP/B vs balance {balance:.1f} "
              f"-> {bound}-side of the roofline")
        if gbs > PEAK_GBPS:
            print(f"{indent}(counted bytes exceed the physical peak -> "
                  f"cost-analysis bytes are an UPPER BOUND on real HBM "
                  f"traffic; >= {100 * (1 - PEAK_GBPS / gbs):.0f}% of the "
                  f"counted traffic must stay on-chip)")
    return {"gflop": fl / 1e9, "gb": by / 1e9, "ms": dt * 1e3,
            "tflops": tfs, "gbps": gbs,
            "mfu_pct": tfs / PEAK_TFLOPS * 100,
            "hbm_pct": (gbs / PEAK_GBPS * 100) if by else None,
            "intensity": ai, "bound": bound}


def report(name, compiled, args, iters):
    fl, by = _cost(compiled)
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}:")
    return {"name": name, "dt": dt, **_util_block(fl, by, dt)}


def calibrated_infer_cost(det, variables, cfg, B, L, probes=(3, 7)):
    """Exact inference-window cost via fully-unrolled lowerings.

    bench.build_infer reads BENCH_UNROLL at trace time; with unroll ==
    length the scan emits straight-line HLO (no while loop), so the
    compiled cost analysis counts every op exactly. Lowering at two
    small lengths isolates one backbone step (the difference) and the
    detect head + fixed work (the residual); extrapolating to the
    production L gives the window cost the rolled loop actually
    executes. (FLOPs are exact; BYTES are an upper bound on real HBM
    traffic — "bytes accessed" charges every fusion boundary as an HBM
    round-trip even when XLA keeps the value on-chip, and the implied
    bandwidth measurably exceeds the physical peak, proving the
    over-count. Report bytes as a bound, not an achievement.)

    Returns (flops, bytes, diag) with the probe points in diag."""
    states = det.init_states(B)
    zero = jnp.zeros((), det.dtype)
    pts = []
    old = os.environ.get("BENCH_UNROLL")
    try:
        for l in probes:
            os.environ["BENCH_UNROLL"] = str(l)
            infer = bench.build_infer(det)
            ev = bench.make_ev(cfg, B, l)
            c = jax.jit(infer).lower(variables, ev, states, zero).compile()
            pts.append(_cost(c))
    finally:
        if old is None:
            os.environ.pop("BENCH_UNROLL", None)
        else:
            os.environ["BENCH_UNROLL"] = old
    (f1, b1), (f2, b2) = pts
    d = probes[1] - probes[0]
    sf, sb = (f2 - f1) / d, (b2 - b1) / d
    diag = {"probes": list(probes),
            "gflop_pts": [f1 / 1e9, f2 / 1e9],
            "gb_pts": [b1 / 1e9, b2 / 1e9],
            "gflop_per_step": sf / 1e9, "gb_per_step": sb / 1e9}
    return f1 + (L - probes[0]) * sf, b1 + (L - probes[0]) * sb, diag


def calibrated_train_cost(cfg, det, variables, remat, L, B=8,
                          probes=(4, 8)):
    """Exact train-step cost via fully-unrolled lowerings (compile-only,
    never executed).

    The rolled train scan's cost analysis counts each while body ONCE:
    lowering the same step at L=7, 14 and 21 returns the identical FLOP
    total, so rolled counts are ~L-fold undercounts. (A naive
    "linearity" check that extrapolates through two rolled probes can't
    see this — three flat numbers sit on a zero-slope line that passes
    through all of them.) make_train_step(unroll=l) at scan length l
    emits straight-line HLO instead — forward, remat recompute and
    backward all instantiated per timestep — so every op instance is
    counted. Two probe lengths isolate the per-step slope and the fixed
    head+SimOTA+loss+optimizer residual; extrapolation to the
    production L gives the cost the rolled loop actually executes.
    FLOPs are exact; BYTES are an upper bound (fusion boundaries are
    charged as HBM round-trips even when values stay on-chip).

    Probes must be >= 4 (build_train_setup's frame_t spans [3, L-1])."""
    from leod_tpu.train.step import make_train_step
    from leod_tpu.train.trainer import default_frames_per_slot

    # pin the PRODUCTION harvest budget M across both probe lengths —
    # build_train_setup would otherwise derive M from each probe's
    # (shorter) L, and the head/SimOTA residual would stop being fixed
    # between probes, corrupting the slope/residual split
    M = default_frames_per_slot(L, cfg.model.use_label_every)
    pts = []
    for l in probes:
        c_l = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset,
                                             sequence_length=l))
        state, batch, optimizer = bench.build_train_setup(
            c_l, det, B=B, M=M, variables=variables)
        step_fn = make_train_step(det, optimizer, remat=remat, unroll=l)
        compiled = jax.jit(step_fn).lower(state, batch).compile()
        pts.append(_cost(compiled))
    (f1, b1), (f2, b2) = pts
    d = probes[1] - probes[0]
    sf, sb = (f2 - f1) / d, (b2 - b1) / d
    diag = {"probes": list(probes),
            "gflop_pts": [f1 / 1e9, f2 / 1e9],
            "gb_pts": [b1 / 1e9, b2 / 1e9],
            "gflop_per_step": sf / 1e9, "gb_per_step": sb / 1e9}
    return f1 + (L - probes[0]) * sf, b1 + (L - probes[0]) * sb, diag


def probe_peaks(iters: int = 30):
    """Empirically ACHIEVABLE ceilings through this exact stack (jit +
    on-device scan, same dispatch path as the workloads), so the
    roofline is anchored to measured reality, not datasheet numbers.

    - matmul ceiling: chained bf16 8192x8192 matmuls on the scan carry
      (data-dependent -> no hoisting), 2*N^3 FLOP per trip.
    - stream ceiling: one fused elementwise pass (y = y*a + b) over a
      1 GiB bf16 carry: 1 GiB read + 1 GiB write per trip of
      irreducible HBM traffic (the classic STREAM-scale bound).
    """
    n = 8192
    b = jnp.full((n, n), 1e-2, jnp.bfloat16)

    @jax.jit
    def mm(a):
        return jax.lax.scan(lambda c, _: (c @ b, None), a, None,
                            length=iters)[0]

    @jax.jit
    def stream(y):
        return jax.lax.scan(
            lambda c, _: (c * jnp.bfloat16(1.0001) + jnp.bfloat16(1e-3),
                          None), y, None, length=iters)[0]

    out = {}
    for name, fn, arg, work, unit in (
            ("matmul_tflops", mm, jnp.full((n, n), 1e-2, jnp.bfloat16),
             2.0 * n * n * n * iters / 1e12, "TFLOP/s"),
            ("stream_gbps", stream,
             jnp.ones((512 * 1024 * 1024,), jnp.bfloat16),
             2.0 * (1 << 30) * iters / 1e9, "GB/s")):
        r = fn(arg)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = fn(arg)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        out[name] = work / dt
        nominal = PEAK_TFLOPS if "tflops" in name else PEAK_GBPS
        print(f"  measured {name.split('_')[0]} ceiling: "
              f"{out[name]:.1f} {unit} = {out[name] / nominal * 100:.0f}% "
              f"of nominal peak ({nominal:.0f})")
    return out


def run_dataset(dataset: str, iters: int, calibrate: bool = True):
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.step import make_train_step

    cfg = experiment_preset(dataset, "base")
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    # match bench.py's per-dataset workloads (gen1 headline B=16;
    # gen4 reference recipe bs 8) so the roofline rows and the
    # throughput bench describe the same programs
    B = int(os.environ.get("BENCH_BATCH", "16" if dataset == "gen1"
                           else "8"))
    L = cfg.dataset.sequence_length
    infer = bench.build_infer(det)
    ev = bench.make_ev(cfg, B, L)
    states = det.init_states(B)
    zero = jnp.zeros((), det.dtype)
    compiled = jax.jit(infer).lower(variables, ev, states, zero).compile()
    rows = [report(f"{dataset} inference window (B={B}, L={L})", compiled,
                   (variables, ev, states, zero), iters=iters)]
    if calibrate:
        fl_c, by_c, diag = calibrated_infer_cost(det, variables, cfg, B, L)
        print(f"  calibrated from unrolled lowerings at L={diag['probes']} "
              f"({diag['gflop_per_step']:.1f} GFLOP/step + head):")
        rows[0]["calibrated"] = {**_util_block(fl_c, by_c, rows[0]["dt"],
                                               indent="    "), **diag}

    # train step at the production recipe (bs 8 both datasets)
    remat = os.environ.get("BENCH_REMAT", "full")
    state, batch, optimizer = bench.build_train_setup(cfg, det, B=8,
                                                      variables=variables)
    step_fn = make_train_step(det, optimizer, remat=remat)
    compiled = jax.jit(step_fn).lower(state, batch).compile()
    rows.append(report(f"{dataset} train step (bs=8, L={L}, remat={remat})",
                       compiled, (state, batch), iters=max(iters // 2, 3)))
    if calibrate:
        fl_t, by_t, tdiag = calibrated_train_cost(cfg, det, variables,
                                                  remat, L)
        print(f"  calibrated from unrolled lowerings at L={tdiag['probes']} "
              f"({tdiag['gflop_per_step']:.1f} GFLOP/step fwd+bwd + "
              f"head/loss/opt):")
        rows[1]["calibrated"] = {**_util_block(fl_t, by_t, rows[1]["dt"],
                                               indent="    "), **tdiag}
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1",
                    choices=["gen1", "gen4", "all"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-calibrate", action="store_true",
                    help="skip the unrolled-lowering calibration passes")
    ap.add_argument("--json", default=None,
                    help="also dump all rows as JSON to this path")
    ap.add_argument("--peaks", action="store_true",
                    help="also measure achievable matmul/stream ceilings")
    args = ap.parse_args()
    datasets = ["gen1", "gen4"] if args.dataset == "all" else [args.dataset]
    rows = []
    if args.peaks:
        print("machine ceilings (measured through this stack):")
        rows.append({"name": "measured_ceilings", **probe_peaks()})
    for d in datasets:
        rows += run_dataset(d, args.iters, calibrate=not args.no_calibrate)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"rows -> {args.json}")


if __name__ == "__main__":
    main()
