"""Timing + profiling utilities.

The reference ships manual CUDA-sync timers that are wired to a no-op
in production (reference: utils/timers.py:12-95, detector.py:13-14).
Here timing is first-class: wall-clock spans with device sync via
`block_until_ready`, an atexit summary, and one-call `jax.profiler`
trace capture for TensorBoard.
"""
from __future__ import annotations

import atexit
import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

_SPANS: Dict[str, List[float]] = defaultdict(list)
_ENABLED = True


def set_enabled(flag: bool):
    global _ENABLED
    _ENABLED = flag


@contextlib.contextmanager
def span(name: str, sync_on=None):
    """Time a block; pass a jax array as `sync_on` to include device work."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync_on is not None:
            try:
                import jax
                jax.block_until_ready(sync_on)
            except Exception:
                pass
        _SPANS[name].append(time.perf_counter() - t0)


def summary() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, vals in _SPANS.items():
        v = np.asarray(vals)
        out[name] = {"n": int(v.size), "mean_ms": float(v.mean() * 1e3),
                     "p50_ms": float(np.median(v) * 1e3),
                     "total_s": float(v.sum())}
    return out


def _dump():
    s = summary()
    if not s:
        return
    print("=== timer summary ===")
    for name, st in sorted(s.items()):
        print(f"  {name}: n={st['n']} mean={st['mean_ms']:.2f}ms "
              f"p50={st['p50_ms']:.2f}ms total={st['total_s']:.2f}s")


atexit.register(_dump)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
