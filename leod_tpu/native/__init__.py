"""Native host library loader (builds on demand with g++, ctypes ABI).

Python callers fall back to numpy implementations when unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libleod_host.so")
_SRC = os.path.join(_DIR, "host_ops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        # build to a per-pid temp name and rename: concurrent processes
        # (two pseudo-gen shards both importing) must never dlopen a
        # half-written .so — rename is atomic on the same filesystem
        tmp = f"{_SO}.build.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception as e:                                # pragma: no cover
        print(f"leod_tpu.native: build failed ({e}); using numpy fallbacks")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # stale/truncated/ABI-broken .so: rebuild once, then honor
            # the module contract (numpy fallback) instead of crashing
            # callers mid-eval
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError as e:                          # pragma: no cover
                print(f"leod_tpu.native: dlopen failed ({e}); "
                      f"using numpy fallbacks")
                return None
        lib.leod_nms.restype = ctypes.c_int
        lib.leod_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.leod_coco_eval_image.restype = None
        lib.leod_coco_eval_image.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def nms(boxes_xyxy: np.ndarray, scores: np.ndarray,
        class_ids: Optional[np.ndarray], iou_threshold: float
        ) -> Optional[np.ndarray]:
    """Native greedy NMS; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(boxes_xyxy)
    if n == 0:
        return np.zeros((0,), np.int64)
    b = np.ascontiguousarray(boxes_xyxy, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    c = np.ascontiguousarray(
        class_ids if class_ids is not None else np.zeros(n), np.float32)
    keep = np.zeros(n, np.int32)
    k = lib.leod_nms(_ptr(b, ctypes.c_float), _ptr(s, ctypes.c_float),
                     _ptr(c, ctypes.c_float), n,
                     ctypes.c_float(iou_threshold),
                     int(class_ids is not None), _ptr(keep, ctypes.c_int))
    return keep[:k].astype(np.int64)


def coco_eval_image(dt_xywh: np.ndarray, gt_xywh: np.ndarray,
                    gt_ignore: np.ndarray, thrs: np.ndarray,
                    area_ranges: np.ndarray):
    """Native COCO per-image matching over ALL area ranges with the IoU
    matrix computed once; None if the library is unavailable.
    dt must be score-sorted desc (caller caps maxDet).
    Returns (dt_matched [A,T,D] bool, dt_ig [A,T,D] bool, npig [A] int)."""
    lib = get_lib()
    if lib is None:
        return None
    d, g, t = len(dt_xywh), len(gt_xywh), len(thrs)
    ar = np.ascontiguousarray(area_ranges, np.float64).reshape(-1, 2)
    a = len(ar)
    dt = np.ascontiguousarray(dt_xywh, np.float64)
    gt = np.ascontiguousarray(gt_xywh, np.float64)
    gi = np.ascontiguousarray(gt_ignore, np.uint8)
    th = np.ascontiguousarray(thrs, np.float64)
    dtm = np.zeros((a, t, d), np.uint8)
    dt_ig = np.zeros((a, t, d), np.uint8)
    npig = np.zeros((a,), np.int32)
    lib.leod_coco_eval_image(
        _ptr(dt, ctypes.c_double), d, _ptr(gt, ctypes.c_double), g,
        _ptr(gi, ctypes.c_uint8), _ptr(th, ctypes.c_double), t,
        _ptr(ar, ctypes.c_double), a,
        _ptr(dtm, ctypes.c_uint8), _ptr(dt_ig, ctypes.c_uint8),
        _ptr(npig, ctypes.c_int32))
    return dtm.astype(bool), dt_ig.astype(bool), npig
