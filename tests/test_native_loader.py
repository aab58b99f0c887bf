"""Native library loader: stale-.so recovery and numpy-fallback contract
(leod_tpu/native/__init__.py get_lib)."""
import os
import shutil

import numpy as np
import pytest

import leod_tpu.native as native


@pytest.fixture
def isolated_native(tmp_path, monkeypatch):
    """Run get_lib against a private copy of the source so the test can
    corrupt the .so without touching the real build, and reset the
    module's memoization."""
    src = tmp_path / "host_ops.cpp"
    shutil.copy(native._SRC, src)
    so = tmp_path / "libleod_host.so"
    monkeypatch.setattr(native, "_SRC", str(src))
    monkeypatch.setattr(native, "_SO", str(so))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    return so


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native toolchain unavailable (numpy fallback)")
def test_corrupt_so_is_rebuilt(isolated_native):
    """A truncated/garbage .so newer than the source (e.g. a crashed
    concurrent build before the atomic-rename fix) must be rebuilt, not
    crash callers with an uncaught dlopen OSError."""
    so = isolated_native
    so.write_bytes(b"not a shared object")
    os.utime(so)                                   # newer than the source
    lib = native.get_lib()
    assert lib is not None                         # rebuilt and loaded
    # and the rebuilt library actually works
    keep = native.nms(np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32),
                      np.array([0.9, 0.8], np.float32), None, 0.45)
    assert keep.tolist() == [0]


def test_unbuildable_falls_back_to_none(isolated_native, monkeypatch):
    """When both the load and the rebuild fail, get_lib returns None so
    ops/nms.py and eval/coco.py take their numpy fallbacks (the module
    docstring's contract)."""
    so = isolated_native
    so.write_bytes(b"garbage")
    os.utime(so)
    monkeypatch.setattr(native, "_build", lambda: False)
    assert native.get_lib() is None
    assert native.nms(np.zeros((1, 4), np.float32),
                      np.ones(1, np.float32), None, 0.5) is None
