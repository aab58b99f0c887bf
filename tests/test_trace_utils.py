"""Shared profiler-trace parsing (leod_tpu/utils/trace.py) and its two
consumers — bench._trace_step_percentiles and tools/trace_agg.aggregate —
on a synthetic trace dump (no TPU needed)."""
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leod_tpu.utils.trace import is_scan_wrapper, load_device_events


def _write_trace(out_dir, events):
    d = os.path.join(out_dir, "plugins", "profile", "run1")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def test_load_device_events_filters_lanes_and_jit_rows(tmp_path):
    events = [
        _meta(1, "/device:TPU:0 XLA Ops"),
        _meta(2, "python host threads"),
        {"ph": "X", "pid": 1, "name": "fusion.1", "ts": 0, "dur": 5},
        {"ph": "X", "pid": 1, "name": "jit_infer", "ts": 0, "dur": 99},
        {"ph": "X", "pid": 1, "name": "%while.3", "ts": 0, "dur": 50},
        {"ph": "X", "pid": 2, "name": "host_op", "ts": 0, "dur": 7},
        {"ph": "C", "pid": 1, "name": "counter", "ts": 0},
    ]
    _write_trace(str(tmp_path), events)
    path, pid_names, dev = load_device_events(str(tmp_path))
    assert path and pid_names[1].startswith("/device")
    names = sorted(e["name"] for e in dev)
    # host lane + jit wrapper dropped; while row KEPT (callers decide)
    assert names == ["%while.3", "fusion.1"]
    assert is_scan_wrapper("%while.3") and not is_scan_wrapper("fusion.1")


def test_load_device_events_empty_dir(tmp_path):
    assert load_device_events(str(tmp_path)) == (None, {}, [])


def test_bench_percentiles_from_synthetic_trace(tmp_path):
    """_trace_step_percentiles recovers per-iteration p50/p99 from the
    dominant op's start-timestamp diffs (one start per iteration)."""
    import bench

    iters = 20
    rng = np.random.default_rng(0)
    # iteration period ~2 ms with one 10 ms straggler
    periods_us = np.full(iters - 1, 2000.0)
    periods_us[10] = 10000.0
    starts = np.concatenate([[0.0], np.cumsum(periods_us)])
    events = [_meta(7, "/device:TPU:0 XLA Ops")]
    for t in starts:
        events.append({"ph": "X", "pid": 7, "name": "fusion.main",
                       "ts": t, "dur": 1500})
    # a scan wrapper row that must NOT be picked as the marker op
    events.append({"ph": "X", "pid": 7, "name": "%while.1",
                   "ts": 0, "dur": 40000})
    _write_trace(str(tmp_path), events)
    p50, p95, p99, n = bench._trace_step_percentiles(str(tmp_path), iters)
    assert abs(p50 - 2.0) < 1e-6
    assert p99 >= p95 >= p50          # straggler pulls the tail up
    assert p99 > 2.0
    assert n == iters - 1             # one duration sample per diff


def test_trace_agg_train_mode_smoke(tmp_path):
    """tools/trace_agg.py PROF_MODE=train end-to-end on CPU at a tiny
    config: capture a real jax.profiler trace of the jitted train-step
    loop and aggregate it (device-lane rows exist and categorize)."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PROF_DATASET="gen1",
               PROF_MODE="train", PROF_SIZE="tiny", PROF_SEQ_LEN="5",
               PROF_ITERS="2", PROF_BATCH="2")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "trace_agg.py"),
         str(tmp_path / "trace")],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "workload: gen1 train B=2 L=5 x2 iters" in out.stdout
    assert "== by category ==" in out.stdout
