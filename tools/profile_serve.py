#!/usr/bin/env python
"""End-to-end ServingEngine latency/throughput profile (real device).

Measures the FULL serving stack — client thread -> micro-batch
coalescing -> jitted serve step -> numpy readback — as a client would
see it, versus bench.py's pure on-device b1 latency. Reports request
p50/p99 for a single stream (latency path: every tick runs one row of
the exported batch) and aggregate throughput with `--streams` concurrent
clients saturating the slot table.

Usage:
    python tools/profile_serve.py                      # flagship on TPU
    python tools/profile_serve.py --cpu --size tiny    # CPU smoke
    python tools/profile_serve.py --streams 16         # saturation run

The reference has no serving story to compare against (its inference
entry points are batch scripts, reference: val.py / predict.py).
"""
import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base", choices=["tiny", "small", "base"])
    ap.add_argument("--batch-size", type=int, default=16,
                    help="stream slots in the compiled step")
    ap.add_argument("--streams", type=int, default=1,
                    help="concurrent client streams (throughput mode)")
    ap.add_argument("--iters", type=int, default=200,
                    help="requests per stream")
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--max-wait-ms", type=float, default=0.0,
                    help="micro-batch coalescing window. 0 = dispatch "
                         "immediately (honest single-stream latency); "
                         "cli/serve.py defaults to 2 ms, which bounds "
                         "added latency but lifts multi-client "
                         "throughput by filling slots per step")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from leod_tpu.config import derive, experiment_preset
    from leod_tpu.models.detector import Detector
    from leod_tpu.serve import ServingEngine, make_serve_step, \
        serve_input_shape

    cfg = derive(experiment_preset(args.dataset, args.size))
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    step_fn = jax.jit(make_serve_step(det, variables))
    states = det.init_states(args.batch_size)
    frame_shape = serve_input_shape(cfg, args.batch_size)[1:]

    engine = ServingEngine(step_fn, states, frame_shape,
                           max_wait_ms=args.max_wait_ms)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 40, frame_shape).astype(np.uint8)

    print(f"{args.dataset}/{args.size} B={args.batch_size} "
          f"streams={args.streams} frame {frame_shape}", flush=True)
    engine.detect("warm", frame)  # compile

    lat_ms = {s: [] for s in range(args.streams)}

    def client(s: int):
        name = f"cam{s}"
        for _ in range(args.warmup):
            engine.detect(name, frame)
        for _ in range(args.iters):
            t0 = time.perf_counter()
            engine.detect(name, frame)
            lat_ms[s].append((time.perf_counter() - t0) * 1e3)

    threads = [threading.Thread(target=client, args=(s,))
               for s in range(args.streams)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    engine.close()

    all_lat = np.concatenate([np.asarray(v) for v in lat_ms.values()])
    total = args.streams * (args.iters + args.warmup)
    out = {
        "requests": int(total),
        "req_per_s": round(total / wall, 1),
        "latency_p50_ms": round(float(np.percentile(all_lat, 50)), 3),
        "latency_p95_ms": round(float(np.percentile(all_lat, 95)), 3),
        "latency_p99_ms": round(float(np.percentile(all_lat, 99)), 3),
        "latency_mean_ms": round(float(all_lat.mean()), 3),
        "device_steps": engine.stats()["steps"],
    }
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
