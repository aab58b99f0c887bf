"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on CPU with
`--xla_force_host_platform_device_count=8` (the driver separately
dry-runs the multi-chip path; real benchmarks run on TPU).
"""
import os

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
