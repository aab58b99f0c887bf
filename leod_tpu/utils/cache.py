"""Persistent XLA compilation cache for the CLI entry points.

Model-sized compiles dominate CLI startup (minutes on CPU, ~20-40 s per
program on TPU, CLAUDE.md); identical (program, backend, flags) keys
re-run constantly across train/val/predict invocations. JAX's
persistent cache makes the second invocation skip them. The test suite
enables the same cache repo-locally (tests/conftest.py); this helper is
for the CLIs and library users.

Opt out with LEOD_NO_COMPILE_CACHE=1; override the location with
LEOD_COMPILE_CACHE_DIR. The cache is keyed on backend + XLA flags +
program, so CPU/TPU entries coexist safely in one directory.
"""
from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Must run before the first compilation (call it right after the CLI
    resolves its backend). Returns the cache dir, or None when disabled.
    """
    if os.environ.get("LEOD_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    path = os.environ.get(
        "LEOD_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "leod_tpu_jax"))
    jax.config.update("jax_compilation_cache_dir", path)
    # only persist compiles that are worth the disk/serialize overhead
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
