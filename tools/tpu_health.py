#!/usr/bin/env python
"""TPU chip-health probe: run a trivial jit with a hard wall-clock cap.

In this environment the axon claim WAITS indefinitely when the chip is
wedged (a killed grant holder can block new clients for hours —
CLAUDE.md "grant-wedge recovery"), so a plain `jax.devices()` hang is
indistinguishable from a slow compile. This probe runs the check in a
subprocess with a timeout and prints ONE JSON line:

    {"ok": true,  "seconds": 3.2}
    {"ok": false, "reason": "timeout", "seconds": 120.0}
    {"ok": false, "reason": "RuntimeError: ...", "seconds": 1.1}

Usage:
    python tools/tpu_health.py [--timeout 120] [--watch] [--every 240]

--watch loops until the chip answers (exit 0) or --attempts run out
(exit 1) — the recovery pattern after a wedge: leave it running, do CPU
work, come back when it prints ok.
"""
import argparse
import json
import subprocess
import sys
import time

_CHILD = """
import time, json, sys
t0 = time.time()
try:
    import jax, jax.numpy as jnp
    v = float(jax.jit(lambda a: a * 2)(jnp.ones((2, 2))).sum())
    print(json.dumps({"ok": v == 8.0, "seconds": round(time.time() - t0, 1)}))
except BaseException as e:
    print(json.dumps({"ok": False, "reason": f"{type(e).__name__}: {e}",
                      "seconds": round(time.time() - t0, 1)}))
"""


def probe(timeout: float) -> dict:
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", _CHILD],
                             capture_output=True, text=True, timeout=timeout)
        line = out.stdout.strip().splitlines()
        if line:
            return json.loads(line[-1])
        return {"ok": False, "reason": f"no output (rc {out.returncode})",
                "seconds": round(time.time() - t0, 1)}
    except subprocess.TimeoutExpired:
        return {"ok": False, "reason": "timeout",
                "seconds": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="per-probe wall-clock cap (s); a healthy chip "
                         "answers in seconds, first-ever compile ~40 s")
    ap.add_argument("--watch", action="store_true",
                    help="retry until healthy or --attempts exhausted")
    ap.add_argument("--every", type=float, default=240.0,
                    help="seconds between --watch attempts")
    ap.add_argument("--attempts", type=int, default=30)
    args = ap.parse_args()

    attempts = args.attempts if args.watch else 1
    for i in range(attempts):
        res = probe(args.timeout)
        print(json.dumps(res), flush=True)
        if res["ok"]:
            return 0
        if i + 1 < attempts:
            time.sleep(args.every)
    return 1


if __name__ == "__main__":
    sys.exit(main())
