"""Raw-recording importer: voxelization oracle + loader round-trip."""
import numpy as np
import pytest

from leod_tpu.config import DatasetConfig
from leod_tpu.data.import_raw import (_parse_class_map, import_recording,
                                      import_split)
from leod_tpu.data.psee import EVENT_DTYPE, write_dat
from leod_tpu.data.sequence import EventSequence

from test_voxel import numpy_stacked_histogram

H, W, BINS, DT = 48, 64, 4, 50_000


def _make_raw(tmp_path, name="rec_000", n=6000, n_windows=5, seed=0,
              legacy_label_names=True):
    rng = np.random.default_rng(seed)
    ev = np.empty(n, dtype=EVENT_DTYPE)
    ev["t"] = np.sort(rng.integers(0, n_windows * DT, n).astype(np.uint32))
    ev["x"] = rng.integers(0, W, n)
    ev["y"] = rng.integers(0, H, n)
    ev["p"] = rng.integers(0, 2, n)
    write_dat(str(tmp_path / f"{name}.dat"), ev, height=H, width=W)
    # labels at the end of windows 2 and 4, legacy Prophesee field names
    names = (["ts", "x", "y", "w", "h", "class_id", "confidence"]
             if legacy_label_names else
             ["t", "x", "y", "w", "h", "class_id", "class_confidence"])
    boxes = np.zeros(3, dtype=[(nm, "<i8" if nm in ("t", "ts") else
                                ("<u4" if nm == "class_id" else "<f4"))
                               for nm in names])
    boxes[names[0]] = [2 * DT, 2 * DT, 4 * DT]
    boxes["x"] = [5, 20, 8]
    boxes["y"] = [6, 10, 12]
    boxes["w"] = [12, 14, 16]
    boxes["h"] = [10, 12, 9]
    boxes["class_id"] = [0, 1, 3]
    boxes[names[-1]] = 1.0
    np.save(str(tmp_path / f"{name}_bbox.npy"), boxes)
    return ev, boxes


def test_import_matches_numpy_oracle(tmp_path):
    ev, _ = _make_raw(tmp_path)
    seq_dir = str(tmp_path / "out" / "train" / "rec_000")
    num_reprs, n_lab = import_recording(
        str(tmp_path / "rec_000.dat"), str(tmp_path / "rec_000_bbox.npy"),
        seq_dir, height=H, width=W, bins=BINS, dt_us=DT, batch=2)
    assert num_reprs == 5 and n_lab == 2
    import h5py
    with h5py.File(f"{seq_dir}/event_representations_v2/"
                   "stacked_histogram_dt=50_nbins=4/"
                   "event_representations.h5") as f:
        data = f["data"][:]
    assert data.shape == (5, 2 * BINS, H, W) and data.dtype == np.uint8
    t = ev["t"].astype(np.int64)
    for k in range(5):
        m = (t >= k * DT) & (t < (k + 1) * DT)
        want = numpy_stacked_histogram(
            ev["x"][m].astype(int), ev["y"][m].astype(int),
            ev["p"][m].astype(int), t[m] - (t[m][0] if m.any() else 0),
            BINS, H, W)
        np.testing.assert_array_equal(data[k], want)


def test_labels_and_loader_roundtrip(tmp_path):
    _make_raw(tmp_path)
    out = str(tmp_path / "ds")
    n = import_split(str(tmp_path), out, "train", height=H, width=W,
                     bins=BINS, dt_us=DT, class_map={0: 0, 1: 1, 3: 2})
    assert n == 1
    cfg = DatasetConfig(path=out, resolution_hw=(H, W),
                        ev_repr_name="stacked_histogram_dt=50_nbins=4")
    seq = EventSequence(f"{out}/train/rec_000", cfg)
    assert seq.num_ev_repr == 5
    # two labeled frames (windows 1 and 3: labels at t=2*DT and 4*DT)
    np.testing.assert_array_equal(seq.objframe_idx_2_repr_idx, [1, 3])
    lab0, kept0 = seq.labels_at_repr_idx(1)
    assert kept0 and len(lab0) == 2
    np.testing.assert_array_equal(np.sort(lab0.arr[:, 5]), [0, 1])
    # raw class 3 remapped to 2 by the class map
    lab1, _ = seq.labels_at_repr_idx(3)
    assert len(lab1) == 1 and int(lab1.arr[0, 0]) == 4 * DT
    assert int(lab1.arr[0, 5]) == 2


def test_ds2_layout(tmp_path):
    _make_raw(tmp_path, n=3000, n_windows=3)
    seq_dir = str(tmp_path / "out4" / "train" / "rec_000")
    import_recording(str(tmp_path / "rec_000.dat"), None, seq_dir,
                     height=H, width=W, bins=BINS, dt_us=DT, ds2=True)
    import h5py
    with h5py.File(f"{seq_dir}/event_representations_v2/"
                   "stacked_histogram_dt=50_nbins=4/"
                   "event_representations_ds2_nearest.h5") as f:
        assert f["data"].shape == (3, 2 * BINS, H // 2, W // 2)


def test_multiple_timestamps_one_window_single_objframe(tmp_path):
    """Labels at several distinct timestamps inside ONE dt window must
    form a single objframe (EventSequence's repr_idx->objframe map is a
    dict; per-timestamp objframes would shadow all but the last group —
    the 60 Hz-labels-vs-50 ms-windows 1Mpx case)."""
    ev = np.empty(100, dtype=EVENT_DTYPE)
    ev["t"] = np.linspace(0, 3 * DT - 1, 100).astype(np.uint32)
    ev["x"], ev["y"], ev["p"] = 1, 2, 1
    write_dat(str(tmp_path / "r.dat"), ev, height=H, width=W)
    boxes = np.zeros(5, dtype=[("t", "<i8"), ("x", "<f4"), ("y", "<f4"),
                               ("w", "<f4"), ("h", "<f4"),
                               ("class_id", "<u4"),
                               ("class_confidence", "<f4")])
    # three timestamps in window 1, one in window 2
    boxes["t"] = [DT + 5, DT + 5, DT + 20_000, DT + 40_000, 2 * DT + 9]
    boxes["x"] = np.arange(5)
    boxes["w"] = boxes["h"] = 4
    boxes["class_confidence"] = 1.0
    np.save(str(tmp_path / "r_bbox.npy"), boxes)
    seq_dir = str(tmp_path / "o" / "train" / "r")
    num_reprs, n_lab = import_recording(
        str(tmp_path / "r.dat"), str(tmp_path / "r_bbox.npy"), seq_dir,
        height=H, width=W, bins=BINS, dt_us=DT)
    assert n_lab == 2
    cfg = DatasetConfig(path=str(tmp_path / "o"), resolution_hw=(H, W),
                        ev_repr_name="stacked_histogram_dt=50_nbins=4")
    seq = EventSequence(seq_dir, cfg)
    np.testing.assert_array_equal(seq.objframe_idx_2_repr_idx, [1, 2])
    lab0, _ = seq.labels_at_repr_idx(1)
    assert len(lab0) == 4          # every box of the window is reachable
    np.testing.assert_array_equal(np.sort(lab0.arr[:, 1]), [0, 1, 2, 3])
    lab1, _ = seq.labels_at_repr_idx(2)
    assert len(lab1) == 1 and int(lab1.arr[0, 1]) == 4


def test_import_split_dedupes_dat_and_npy(tmp_path):
    """A recording present as both .dat and .npy imports once."""
    ev, _ = _make_raw(tmp_path, n=500, n_windows=2)
    np.save(str(tmp_path / "rec_000.npy"), ev)
    n = import_split(str(tmp_path), str(tmp_path / "dd"), "train",
                     height=H, width=W, bins=BINS, dt_us=DT)
    assert n == 1


def test_parse_class_map():
    assert _parse_class_map("0:0,2:1") == {0: 0, 2: 1}
    assert _parse_class_map(None) is None
