"""Shared jax.profiler trace-loading helpers.

One owner for the fragile parts of reading a profiler dump — newest
trace discovery, device-lane pid detection, X-event filtering — used by
both bench.py's b1-latency percentiles and tools/trace_agg.py's op
aggregation so a profiler format change breaks (and gets fixed) in one
place.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Dict, List, Optional, Tuple


def load_device_events(out_dir: str
                       ) -> Tuple[Optional[str], Dict[int, str], List[dict]]:
    """Load the newest trace under `out_dir` and return
    (trace_path, pid->process_name, device-lane X events).

    Device lanes are pids whose process name mentions TPU / a device /
    XLA ops. `jit_*` wrapper rows are dropped (they duplicate their
    contents); scan `while` wrapper rows are KEPT — callers decide, they
    contain the inner ops (CLAUDE.md) and double-count if summed.
    Returns (None, {}, []) when no trace exists."""
    paths = glob.glob(os.path.join(
        out_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return None, {}, []
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {pid for pid, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA Op" in n}
    dev_events = [e for e in events
                  if e.get("ph") == "X" and e.get("pid") in dev_pids
                  and not e.get("name", "?").startswith("jit_")]
    return path, pid_names, dev_events


def is_scan_wrapper(name: str) -> bool:
    """Scan/while wrapper rows contain their inner ops' time."""
    return name.lstrip("%").startswith("while")
