"""Driver-contract tests for __graft_entry__.

The driver imports the module and calls dryrun_multichip(n) directly —
possibly in a process where the TPU plugin already hijacked
jax_platforms — so dryrun_multichip must self-provision the virtual CPU
mesh in a subprocess rather than assume devices exist (round-1 failure:
MULTICHIP_r01.json rc=1).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_self_provisions_without_env():
    """Call dryrun_multichip(2) from a clean interpreter with NO
    XLA_FLAGS / JAX_PLATFORMS set — exactly how the driver invokes it."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_LEOD_DRYRUN_CHILD")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip(2): OK" in r.stdout


def test_entry_returns_jittable():
    """entry() must return (fn, example_args) with fn jittable.
    Only trace/lower here (no TPU in the test env; compile is the
    driver's job)."""
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    jax.jit(fn).lower(*args)  # trace succeeds => jittable
