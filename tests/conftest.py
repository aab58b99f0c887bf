"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on CPU with
`--xla_force_host_platform_device_count=8` (the driver separately
dry-runs the multi-chip path; real benchmarks run on TPU).

NOTE: the axon sitecustomize registers the TPU plugin at interpreter
start and calls jax.config.update("jax_platforms", "axon,cpu"), which
overrides JAX_PLATFORMS from the environment — so we must update the
config AFTER importing jax, not just set env vars.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: model-sized CPU compiles dominate the
# suite's ~20 min runtime; re-runs hit the cache instead (verified to
# work on the CPU backend of the pinned jax version).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
