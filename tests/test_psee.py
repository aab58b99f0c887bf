"""Raw .dat/.npy Prophesee readers vs the reference PSEELoader.

The reference loader (utils/evaluation/prophesee/io/psee_loader.py) is
pure numpy/stdlib, so it runs here directly as a differential oracle:
every cursor operation (load_n_events / load_delta_t / seek_time /
seek_event) must return identical events and identical cursor state.
"""
import sys

import numpy as np
import pytest

from leod_tpu.data.labels import PROPH_DTYPE
from leod_tpu.data.psee import (EVENT_DTYPE, RawEventReader, load_boxes,
                                parse_dat_header, write_dat)

sys.path.insert(0, "/root/reference")
from utils.evaluation.prophesee.io import dat_events_tools  # noqa: E402
from utils.evaluation.prophesee.io.psee_loader import PSEELoader  # noqa: E402

# the reference parses ev_size as np.uint8; under numpy>=2 its later
# `(end - start) // ev_size` arithmetic overflows — widen to Python int
_ref_parse_header = dat_events_tools.parse_header
if not getattr(dat_events_tools, "_leod_patched", False):
    dat_events_tools.parse_header = lambda f: tuple(
        int(v) if np.isscalar(v) else v for v in _ref_parse_header(f))
    dat_events_tools._leod_patched = True


def _random_events(rng, n, t_max=1_000_000, h=240, w=320):
    ev = np.empty(n, dtype=EVENT_DTYPE)
    ev["t"] = np.sort(rng.integers(0, t_max, n).astype(np.uint32))
    ev["x"] = rng.integers(0, w, n)
    ev["y"] = rng.integers(0, h, n)
    ev["p"] = rng.integers(0, 2, n)
    return ev


@pytest.fixture(scope="module")
def dat_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    ev = _random_events(rng, 5000)
    path = str(tmp_path_factory.mktemp("psee") / "seq.dat")
    write_dat(path, ev, height=240, width=320)
    return path, ev


def _assert_same(ours: np.ndarray, ref: np.ndarray):
    assert len(ours) == len(ref)
    for name in ("t", "x", "y", "p"):
        np.testing.assert_array_equal(ours[name], ref[name])


def test_dat_roundtrip_and_header(dat_file):
    path, ev = dat_file
    with open(path, "rb") as f:
        _, ev_size, size = parse_dat_header(f)
    assert ev_size == 8 and size == (240, 320)
    r = RawEventReader(path)
    assert len(r) == len(ev) and r.size == (240, 320)
    _assert_same(r.load_n_events(len(ev)), ev)
    assert r.done


def test_load_n_events_matches_reference(dat_file):
    path, _ = dat_file
    ours, ref = RawEventReader(path), PSEELoader(path)
    while not ref.done:
        chunk_ref = ref.load_n_events(777)
        chunk_ours = ours.load_n_events(777)
        _assert_same(chunk_ours, chunk_ref)
        assert ours.current_time == ref.current_time
    assert ours.done


def test_load_delta_t_matches_reference(dat_file):
    path, _ = dat_file
    ours, ref = RawEventReader(path), PSEELoader(path)
    for dt in (10_000, 1, 50_000, 123_456, 10_000_000):
        chunk_ref = ref.load_delta_t(dt)
        chunk_ours = ours.load_delta_t(dt)
        _assert_same(chunk_ours, chunk_ref)
        assert ours.done == ref.done
        if not ref.done:
            assert ours.current_time == ref.current_time
    assert ours.done and ref.done
    _assert_same(ours.load_delta_t(1000), ref.load_delta_t(1000))  # both empty


def test_seek_time_matches_reference(dat_file):
    path, _ = dat_file
    ours, ref = RawEventReader(path), PSEELoader(path)
    rng = np.random.default_rng(1)
    for t in [0, 1, *rng.integers(0, 1_100_000, 20).tolist()]:
        ours.seek_time(int(t))
        ref.seek_time(int(t))
        assert ours.done == ref.done
        _assert_same(ours.load_n_events(13), ref.load_n_events(13))


def test_seek_event_matches_reference(dat_file):
    path, ev = dat_file
    ours, ref = RawEventReader(path), PSEELoader(path)
    for n in (0, 1, 100, len(ev) - 1, len(ev), len(ev) + 5):
        ours.seek_event(n)
        ref.seek_event(n)
        assert ours.current_time == ref.current_time
        assert ours.done == ref.done
    assert ours.total_time() == ref.total_time()


def test_npy_events_and_field_renames(tmp_path):
    rng = np.random.default_rng(2)
    ev = _random_events(rng, 300)
    # legacy field names: ts instead of t
    legacy = np.empty(300, dtype=[("ts", "<u4"), ("x", "<u2"),
                                  ("y", "<u2"), ("p", "u1")])
    for a, b in (("ts", "t"), ("x", "x"), ("y", "y"), ("p", "p")):
        legacy[a] = ev[b]
    path = str(tmp_path / "seq.npy")
    np.save(path, legacy)
    ours, ref = RawEventReader(path), PSEELoader(path)
    chunk_ours, chunk_ref = ours.load_delta_t(400_000), ref.load_delta_t(400_000)
    _assert_same(chunk_ours, chunk_ref)
    assert ours.current_time == ref.current_time


def test_load_boxes_reformat(tmp_path):
    raw = np.zeros(4, dtype=[("ts", "<i8"), ("x", "<f4"), ("y", "<f4"),
                             ("w", "<f4"), ("h", "<f4"),
                             ("class_id", "<u4"), ("confidence", "<f4")])
    raw["ts"] = [10, 20, 30, 40]
    raw["x"] = [1, 2, 3, 4]
    raw["confidence"] = [0.5, 0.6, 0.7, 0.8]
    path = str(tmp_path / "boxes.npy")
    np.save(path, raw)
    boxes = load_boxes(path)
    assert boxes.dtype == PROPH_DTYPE
    np.testing.assert_array_equal(boxes["t"], raw["ts"])
    np.testing.assert_array_equal(boxes["class_confidence"],
                                  raw["confidence"])
    np.testing.assert_array_equal(boxes["track_id"], 0)
