"""cli/vis.py smoke tests, incl. the --reverse side-by-side mode
(reference: vis_pred.py:239-319 renders each sequence normally AND
time-reversed, then hstacks the two videos)."""
import glob
import os
import subprocess
import sys

import pytest

from leod_tpu.data.synthetic import generate_dataset

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_vis_reverse_side_by_side(tmp_path):
    data = tmp_path / "data"
    generate_dataset(str(data), num_train=0, num_val=0, num_test=1,
                     num_reprs=16, label_every=4, first_label_repr=3)
    out = tmp_path / "vis"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "cli", "vis.py"),
         "--path", str(data), "--size", "tiny", "--seq-len", "4",
         "--num-seqs", "1", "--reverse", "--cpu", "--out", str(out)],
        capture_output=True, text=True, timeout=1800, cwd=ROOT)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    normal = [p for p in glob.glob(str(out / "*.mp4"))
              if not p.endswith("_both.mp4")]
    both = glob.glob(str(out / "*_both.mp4"))
    assert normal and both, glob.glob(str(out / "*"))
    # the side-by-side video is two frames + a 4 px pad wide
    import cv2
    wn = cv2.VideoCapture(normal[0]).get(cv2.CAP_PROP_FRAME_WIDTH)
    wb = cv2.VideoCapture(both[0]).get(cv2.CAP_PROP_FRAME_WIDTH)
    assert wb == 2 * wn + 4, (wn, wb)
