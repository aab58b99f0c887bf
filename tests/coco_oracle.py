"""Naive transcription of the pycocotools COCOeval 'bbox' algorithm
(evaluateImg + accumulate + summarize) as an independent oracle for
differentially testing leod_tpu.eval.coco.

The reference's metric IS pycocotools/COCOeval_opt (reference:
utils/evaluation/prophesee/metrics/coco_eval.py:16-29); pycocotools is
not installed in this environment, so this module re-states its
published matching/accumulation semantics in the most literal,
loop-by-loop form possible — dict records, per-(image, category,
area-range) evaluateImg, T-major greedy matching with the exact
tie-break rules, the right-to-left precision envelope, and 101-point
interpolation. Deliberately unoptimized: its only virtue is being an
independent, line-for-line-checkable statement of the protocol.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = [
    ("all", (0.0, 1e10)),
    ("small", (0.0, 32.0 ** 2)),
    ("medium", (32.0 ** 2, 96.0 ** 2)),
    ("large", (96.0 ** 2, 1e10)),
]
MAX_DET = 100


def _iou_one(d: np.ndarray, g: np.ndarray) -> float:
    """Plain xywh IoU of two boxes."""
    dx0, dy0, dw, dh = d
    gx0, gy0, gw, gh = g
    ix = min(dx0 + dw, gx0 + gw) - max(dx0, gx0)
    iy = min(dy0 + dh, gy0 + gh) - max(dy0, gy0)
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    return inter / (dw * dh + gw * gh - inter)


def _evaluate_img(gts: List[dict], dts: List[dict], area_rng, max_det: int
                  ) -> Optional[dict]:
    """COCOeval.evaluateImg for one (image, category, areaRng, maxDet)."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    gt = [dict(g) for g in gts]
    for g in gt:
        g["_ignore"] = 1 if (g["ignore"] or g["area"] < area_rng[0]
                             or g["area"] > area_rng[1]) else 0
    # sort: ignored gts last; dts by descending score, capped at maxDet
    gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dt = [dts[i] for i in dtind[:max_det]]

    T, G, D = len(IOU_THRS), len(gt), len(dt)
    gtIg = np.array([g["_ignore"] for g in gt])
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dtIg = np.zeros((T, D))
    if G and D:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind, g in enumerate(gt):
                    # gt already matched (crowd never happens here)
                    if gtm[tind, gind] > 0:
                        continue
                    # best match so far is a real gt and we have reached
                    # the ignored tail: stop
                    if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                        break
                    v = _iou_one(np.asarray(d["bbox"]), np.asarray(g["bbox"]))
                    if v < iou:
                        continue
                    iou = v
                    m = gind
                if m == -1:
                    continue
                dtIg[tind, dind] = gtIg[m]
                dtm[tind, dind] = 1
                gtm[tind, m] = 1
    # unmatched dets outside the area range are ignored
    a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1]
                  for d in dt]).reshape((1, len(dt)))
    dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtIgnore": dtIg,
        "gtIgnore": gtIg,
        "dtScores": np.array([d["score"] for d in dt]),
    }


def oracle_summarize(images: List[dict], num_categories: int
                     ) -> Dict[str, float]:
    """COCOeval.accumulate + summarize over a list of image records:
    {"gt_boxes": [N,4] xywh, "gt_cats": [N], "gt_ignore": [N] bool,
     "dt_boxes": [M,4], "dt_cats": [M], "dt_scores": [M]}."""
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A = num_categories, len(AREA_RANGES)
    precision = -np.ones((T, R, K, A))

    for k in range(K):
        for ai, (_, rng) in enumerate(AREA_RANGES):
            E = []
            for img in images:
                gsel = np.asarray(img["gt_cats"]) == k
                dsel = np.asarray(img["dt_cats"]) == k
                gts = [{"bbox": b, "area": float(b[2] * b[3]),
                        "ignore": int(ig)}
                       for b, ig in zip(
                           np.asarray(img["gt_boxes"],
                                      np.float64).reshape(-1, 4)[gsel],
                           np.asarray(img["gt_ignore"], bool)[gsel])]
                dts = [{"bbox": b, "area": float(b[2] * b[3]),
                        "score": float(s)}
                       for b, s in zip(
                           np.asarray(img["dt_boxes"],
                                      np.float64).reshape(-1, 4)[dsel],
                           np.asarray(img["dt_scores"], np.float64)[dsel])]
                E.append(_evaluate_img(gts, dts, rng, MAX_DET))
            E = [e for e in E if e is not None]
            if len(E) == 0:
                continue
            dtScores = np.concatenate([e["dtScores"] for e in E])
            inds = np.argsort(-dtScores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in E],
                                 axis=1)[:, inds]
            dtIg = np.concatenate([e["dtIgnore"] for e in E],
                                  axis=1)[:, inds]
            gtIg = np.concatenate([e["gtIgnore"] for e in E])
            npig = int(np.count_nonzero(gtIg == 0))
            if npig == 0:
                continue
            tps = np.logical_and(dtm, np.logical_not(dtIg))
            fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for tind in range(T):
                tp, fp = tp_sum[tind], fp_sum[tind]
                nd = len(tp)
                rc = tp / npig
                pr = (tp / (fp + tp + np.spacing(1))).tolist()
                q = np.zeros((R,))
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds2 = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds2):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[tind, :, k, ai] = q

    def _ap(t_slice=slice(None), area_idx=0):
        p = precision[t_slice, :, :, area_idx]
        p = p[p > -1]
        return float(np.mean(p)) if p.size else -1.0

    return {
        "AP": _ap(),
        "AP_50": _ap(slice(0, 1)),
        "AP_75": _ap(slice(5, 6)),
        "AP_S": _ap(area_idx=1),
        "AP_M": _ap(area_idx=2),
        "AP_L": _ap(area_idx=3),
    }
