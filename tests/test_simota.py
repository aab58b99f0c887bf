"""SimOTA: validate the static-shape masked formulation against an
independent dynamic-shape numpy oracle of the published algorithm."""
import numpy as np
import jax
import jax.numpy as jnp

from leod_tpu.ops.simota import mark_low_conf_as_ignore, simota_assign

IGNORE = 1024


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _iou_matrix(a_cxcywh, b_cxcywh):
    a0 = a_cxcywh[:, :2] - a_cxcywh[:, 2:] / 2
    a1 = a_cxcywh[:, :2] + a_cxcywh[:, 2:] / 2
    b0 = b_cxcywh[:, :2] - b_cxcywh[:, 2:] / 2
    b1 = b_cxcywh[:, :2] + b_cxcywh[:, 2:] / 2
    tl = np.maximum(a0[:, None], b0[None])
    br = np.minimum(a1[:, None], b1[None])
    inter = np.prod(br - tl, -1) * np.all(tl < br, -1)
    area_a = np.prod(a_cxcywh[:, 2:], -1)
    area_b = np.prod(b_cxcywh[:, 2:], -1)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-16)


def oracle_assign(labels, pred_boxes, obj_logits, cls_logits, centers,
                  strides, num_classes):
    """Straightforward dynamic-shape SimOTA (per the published algorithm +
    LEOD's ignore-region extension), used as a test oracle only."""
    G = labels.shape[0]
    A = pred_boxes.shape[0]
    nonpad = labels.sum(-1) > 0
    valid = nonpad & (labels[:, 0] != IGNORE)

    dist = 1.5 * strides
    inc = np.zeros((G, A), bool)
    for g in range(G):
        if not nonpad[g]:
            continue
        gx, gy = labels[g, 1], labels[g, 2]
        inc[g] = ((centers[:, 0] > gx - dist) & (centers[:, 0] < gx + dist) &
                  (centers[:, 1] > gy - dist) & (centers[:, 1] < gy + dist))
    candidate = inc[valid].any(0) if valid.any() else np.zeros(A, bool)
    covered = inc[nonpad].any(0) if nonpad.any() else np.zeros(A, bool)
    ignore_anchor = covered & ~candidate

    fg = np.zeros(A, bool)
    matched = -np.ones(A, np.int64)
    pred_iou = np.zeros(A)
    vg = np.where(valid)[0]
    ca = np.where(candidate)[0]
    if len(vg) and len(ca):
        iou = _iou_matrix(labels[vg][:, 1:5], pred_boxes[ca])
        p = np.sqrt(_sigmoid(cls_logits[ca]) * _sigmoid(obj_logits[ca])[:, None])
        p = np.clip(p, 1e-12, 1 - 1e-12)
        cost = np.zeros((len(vg), len(ca)))
        for i, g in enumerate(vg):
            onehot = np.zeros(num_classes)
            onehot[int(labels[g, 0])] = 1
            bce = -(onehot[None] * np.log(p) + (1 - onehot[None]) * np.log(1 - p))
            cost[i] = bce.sum(-1) - 3 * np.log(iou[i] + 1e-8) + 1e6 * (~inc[g][ca])
        ks = np.maximum(
            np.sort(iou, -1)[:, ::-1][:, :min(10, len(ca))].sum(-1).astype(int), 1)
        m = np.zeros_like(cost, dtype=bool)
        for i in range(len(vg)):
            picks = np.argsort(cost[i], kind="stable")[: ks[i]]
            m[i, picks] = True
        deg = m.sum(0)
        for j in np.where(deg > 1)[0]:
            best = np.argmin(cost[:, j])
            m[:, j] = False
            m[best, j] = True
        for j in range(len(ca)):
            if m[:, j].any():
                i = int(np.argmax(m[:, j]))
                fg[ca[j]] = True
                matched[ca[j]] = vg[i]
                pred_iou[ca[j]] = iou[i, j]
    return fg, ignore_anchor, matched, pred_iou


def _make_problem(rng, G=8, n_valid=4, n_ignore=0, hw=(256, 320), C=2):
    strides_cfg = [(8, hw[0] // 8, hw[1] // 8), (16, hw[0] // 16, hw[1] // 16)]
    centers, strides = [], []
    for s, h, w in strides_cfg:
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        centers.append(np.stack([(xx.ravel() + 0.5) * s, (yy.ravel() + 0.5) * s], -1))
        strides.append(np.full(h * w, s, np.float32))
    centers = np.concatenate(centers).astype(np.float32)
    strides = np.concatenate(strides)
    A = len(strides)

    labels = np.zeros((G, 7), np.float32)
    for i in range(n_valid + n_ignore):
        labels[i] = [rng.integers(0, C), rng.uniform(40, hw[1] - 40),
                     rng.uniform(40, hw[0] - 40), rng.uniform(16, 60),
                     rng.uniform(16, 60), rng.uniform(0.5, 1), rng.uniform(0.5, 1)]
    for i in range(n_valid, n_valid + n_ignore):
        labels[i, 0] = IGNORE

    pred_boxes = np.stack([
        centers[:, 0] + rng.normal(0, 4, A),
        centers[:, 1] + rng.normal(0, 4, A),
        rng.uniform(12, 50, A), rng.uniform(12, 50, A)], -1).astype(np.float32)
    obj_logits = rng.normal(0, 1, A).astype(np.float32)
    cls_logits = rng.normal(0, 1, (A, C)).astype(np.float32)
    return labels, pred_boxes, obj_logits, cls_logits, centers, strides


def _compare(labels, pred_boxes, obj_logits, cls_logits, centers, strides, C=2):
    res = jax.jit(simota_assign, static_argnames=("num_classes",))(
        jnp.asarray(labels), jnp.asarray(pred_boxes), jnp.asarray(obj_logits),
        jnp.asarray(cls_logits), jnp.asarray(centers), jnp.asarray(strides),
        num_classes=C)
    fg_o, ign_o, matched_o, iou_o = oracle_assign(
        labels.astype(np.float64), pred_boxes.astype(np.float64),
        obj_logits.astype(np.float64), cls_logits.astype(np.float64),
        centers.astype(np.float64), strides.astype(np.float64), C)
    fg = np.asarray(res.fg)
    np.testing.assert_array_equal(fg, fg_o)
    np.testing.assert_array_equal(np.asarray(res.ignore), ign_o)
    np.testing.assert_array_equal(np.asarray(res.matched_gt)[fg], matched_o[fg_o])
    np.testing.assert_allclose(np.asarray(res.pred_iou)[fg], iou_o[fg_o],
                               rtol=1e-4, atol=1e-5)
    assert int(res.num_fg) == int(fg_o.sum())


def test_simota_matches_oracle():
    rng = np.random.default_rng(42)
    for trial in range(6):
        _compare(*_make_problem(rng, n_valid=rng.integers(1, 7)))


def test_simota_with_ignore_boxes():
    rng = np.random.default_rng(7)
    for trial in range(4):
        labels, *rest = _make_problem(rng, n_valid=3, n_ignore=2)
        _compare(labels, *rest)
        res = jax.jit(simota_assign, static_argnames=("num_classes",))(
            jnp.asarray(labels), *[jnp.asarray(r) for r in rest], num_classes=2)
        # ignore anchors and fg anchors are disjoint
        assert not np.any(np.asarray(res.fg) & np.asarray(res.ignore))


def test_simota_empty_labels():
    rng = np.random.default_rng(3)
    labels, *rest = _make_problem(rng, n_valid=0)
    res = simota_assign(jnp.asarray(labels), *[jnp.asarray(r) for r in rest],
                        num_classes=2)
    assert int(res.num_fg) == 0
    assert not np.asarray(res.fg).any()
    assert not np.asarray(res.ignore).any()


def test_simota_only_ignore_labels():
    rng = np.random.default_rng(4)
    labels, *rest = _make_problem(rng, n_valid=0, n_ignore=3)
    res = simota_assign(jnp.asarray(labels), *[jnp.asarray(r) for r in rest],
                        num_classes=2)
    # no fg, but ignore regions cover the boxes (yolo_head.py:830-838)
    assert int(res.num_fg) == 0
    assert np.asarray(res.ignore).any()


def test_mark_low_conf_as_ignore():
    labels = np.zeros((1, 3, 7), np.float32)
    labels[0, 0] = [0, 50, 50, 10, 10, 0.9, 0.9]   # above thresh
    labels[0, 1] = [1, 80, 80, 10, 10, 0.2, 0.9]   # obj below cls-1 thresh
    # row 2 stays padding
    out = np.asarray(mark_low_conf_as_ignore(
        jnp.asarray(labels), jnp.asarray([0.7, 0.35]), IGNORE))
    assert out[0, 0, 0] == 0
    assert out[0, 1, 0] == IGNORE
    assert out[0, 2, 0] == 0  # padding untouched


def test_extract_k_matches_sort_with_ties():
    """_extract_k must reproduce the sorted head exactly, including
    duplicated values (each duplicate extracted separately)."""
    from leod_tpu.ops.simota import _extract_k

    rng = np.random.default_rng(7)
    for _ in range(20):
        x = rng.integers(0, 6, (5, 37)).astype(np.float32)  # heavy ties
        k = int(rng.integers(1, 11))
        top = np.asarray(_extract_k(jnp.asarray(x), k, largest=True))
        bot = np.asarray(_extract_k(jnp.asarray(x), k, largest=False))
        np.testing.assert_array_equal(top, np.sort(x, -1)[:, ::-1][:, :k])
        np.testing.assert_array_equal(bot, np.sort(x, -1)[:, :k])


def test_cheapest_k_mask_matches_stable_ranks_with_ties():
    """The sort-free selection must equal ranks-from-double-argsort
    (stable, ties broken by ascending index) for every k in [0, K] on
    tie-heavy rows — the exact semantics the reference's topk gives."""
    from leod_tpu.ops.simota import _cheapest_k_mask

    rng = np.random.default_rng(3)
    K = 10
    for _ in range(30):
        G, A = 6, 43
        cost = rng.integers(0, 7, (G, A)).astype(np.float32)
        k = rng.integers(0, K + 1, G).astype(np.int32)
        got = np.asarray(_cheapest_k_mask(jnp.asarray(cost),
                                          jnp.asarray(k), K))
        order = np.argsort(cost, axis=1, kind="stable")
        ranks = np.argsort(order, axis=1, kind="stable")
        np.testing.assert_array_equal(got, ranks < k[:, None])
