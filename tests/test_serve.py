"""Serving path: the per-frame serve step, AOT export round-trip, and
the micro-batching ServingEngine (leod_tpu/serve.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leod_tpu.config import (BackboneConfig, DatasetConfig, ExperimentConfig,
                             HeadConfig, ModelConfig, stem_fold_hw)
from leod_tpu.models.detector import Detector
from leod_tpu.models.layers import fold_ev_hw
from leod_tpu.ops.nms import postprocess
from leod_tpu.serve import (ServingEngine, artifact_meta, export_serve_step,
                            load_artifact, make_serve_step, save_artifact,
                            serve_input_shape, zero_states_like)


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(
        dataset=dataclasses.replace(DatasetConfig(), name="gen1",
                                    resolution_hw=(64, 96)),
        model=ModelConfig(
            backbone=BackboneConfig(embed_dim=32, in_res_hw=(64, 96),
                                    partition_size=(2, 3)),
            head=HeadConfig(num_classes=2, max_gt=8)))
    det = Detector(cfg.model, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    return cfg, det, variables


def _frames(cfg, batch, n, seed=0):
    """n raw frames [n, B, H, W, C] u8 with some event mass."""
    h, w = cfg.model.backbone.in_res_hw
    c = cfg.model.backbone.input_channels
    rng = np.random.default_rng(seed)
    return rng.integers(0, 40, (n, batch, h, w, c)).astype(np.uint8)


def test_serve_step_recurrence_and_reset(setup):
    """serve_step == manual reset+backbone+detect+postprocess, threads
    state across calls, and `reset` re-zeroes a single slot."""
    cfg, det, variables = setup
    B = 2
    step = jax.jit(make_serve_step(det, variables))
    frames = _frames(cfg, B, 3)
    states = det.init_states(B)
    on = jnp.ones(B, bool)
    off = jnp.zeros(B, bool)

    # manual composition over the same 3 frames
    from leod_tpu.models.backbone import reset_states
    m_states = det.init_states(B)
    pp = cfg.model.postprocess
    for t in range(3):
        feats, m_states = det.forward_backbone(variables, jnp.asarray(frames[t]),
                                               m_states)
        preds, _ = det.forward_detect(variables, feats, train=False)
        m_dets, m_valid = postprocess(
            preds, num_classes=2, conf_threshold=pp.confidence_threshold,
            nms_threshold=pp.nms_threshold, pre_topk=pp.pre_nms_topk,
            max_dets=pp.max_dets)
        states, dets, valid = step(states, jnp.asarray(frames[t]), off, on)
        np.testing.assert_allclose(np.asarray(dets), np.asarray(m_dets),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(m_valid))

    # resetting row 0 zeroes exactly that row's state before the step
    reset = jnp.array([True, False])
    new_states, _, _ = step(states, jnp.asarray(frames[0]), reset, on)
    fresh = det.init_states(B)
    f_states, _, _ = step(fresh, jnp.asarray(frames[0]), off, on)
    for (nh, nc), (fh, fc), (oh, oc) in zip(new_states, f_states, states):
        np.testing.assert_allclose(np.asarray(nh[0]), np.asarray(fh[0]),
                                   rtol=1e-5, atol=1e-6)
        assert not np.allclose(np.asarray(nh[1]), np.asarray(fh[1]))


def test_inactive_slots_hold_state(setup):
    """active=False rows keep their LSTM state bit-identically and
    report zero valid detections."""
    cfg, det, variables = setup
    B = 2
    step = jax.jit(make_serve_step(det, variables))
    frames = _frames(cfg, B, 2, seed=1)
    states = det.init_states(B)
    states, _, _ = step(states, jnp.asarray(frames[0]),
                        jnp.zeros(B, bool), jnp.ones(B, bool))
    before = jax.tree.map(lambda s: np.asarray(s[1]).copy(), states)
    active = jnp.array([True, False])
    new_states, dets, valid = step(states, jnp.asarray(frames[1]),
                                   jnp.zeros(B, bool), active)
    after = jax.tree.map(lambda s: np.asarray(s[1]), new_states)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    assert not np.asarray(valid)[1].any()
    # row 0 advanced
    assert not np.allclose(np.asarray(states[0][0][0]),
                           np.asarray(new_states[0][0][0]))


def test_export_roundtrip(setup, tmp_path):
    """Serialize -> deserialize -> identical outputs to the live step,
    on the prefolded production input layout; zero_states_like
    reconstructs the state table from the artifact alone."""
    cfg, det, variables = setup
    B = 2
    exported = export_serve_step(det, variables, cfg, B, fold=True)
    path = str(tmp_path / "model.stablehlo")
    save_artifact(exported, path, artifact_meta(cfg, B, fold=True))
    step_fn, meta = load_artifact(path)
    assert meta["classes"] == ["car", "pedestrian"]
    assert tuple(meta["frame_shape"]) == serve_input_shape(cfg, B)[1:]

    raw = _frames(cfg, B, 2, seed=2)
    assert stem_fold_hw(cfg.model) == (4, 4)
    live = jax.jit(make_serve_step(det, variables))
    states_a = det.init_states(B)
    states_b = zero_states_like(exported)
    for leaf_a, leaf_b in zip(jax.tree.leaves(states_a),
                              jax.tree.leaves(states_b)):
        assert leaf_a.shape == leaf_b.shape and leaf_a.dtype == leaf_b.dtype
    off, on = jnp.zeros(B, bool), jnp.ones(B, bool)
    for t in range(2):
        ev = jnp.asarray(fold_ev_hw(raw[t]))
        states_a, dets_a, valid_a = live(states_a, ev, off, on)
        states_b, dets_b, valid_b = step_fn(states_b, ev, off, on)
        np.testing.assert_allclose(np.asarray(dets_b), np.asarray(dets_a),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(valid_b),
                                      np.asarray(valid_a))


def test_engine_interleaved_streams(setup):
    """Two streams interleaved through the engine match each stream run
    alone through the raw step (slot isolation + state continuity)."""
    cfg, det, variables = setup
    B = 2
    step = jax.jit(make_serve_step(det, variables))
    shape = serve_input_shape(cfg, 1, fold=False)[1:]
    frames = _frames(cfg, 1, 6, seed=3)[:, 0]  # [6, H, W, C]

    engine = ServingEngine(step, det.init_states(B), shape,
                           max_wait_ms=0.0)
    try:
        got = {"a": [], "b": []}
        for t in range(3):
            got["a"].append(engine.detect("a", frames[2 * t]))
            got["b"].append(engine.detect("b", frames[2 * t + 1]))
        st = engine.stats()
        assert st["streams"] == 2
        # latency percentiles come from the 6 completed requests
        assert st["latency_n"] == 6
        assert 0 < st["latency_ms_p50"] <= st["latency_ms_p95"]
        assert st["latency_ms_p95"] <= st["latency_ms_p99"]
    finally:
        engine.close()

    for name, idx in (("a", [0, 2, 4]), ("b", [1, 3, 5])):
        states = det.init_states(B)
        active = jnp.array([True, False])
        for i, t in enumerate(idx):
            ev = np.zeros((B,) + shape, np.uint8)
            ev[0] = frames[t]
            states, dets, valid = step(states, jnp.asarray(ev),
                                       jnp.zeros(B, bool), active)
            want = np.asarray(dets)[0][np.asarray(valid)[0]]
            np.testing.assert_allclose(got[name][i], want,
                                       rtol=1e-5, atol=1e-6)


def test_engine_eviction_resets(setup):
    """A third stream on a 2-slot engine evicts the LRU stream; the
    evicted stream coming back starts from a reset state."""
    cfg, det, variables = setup
    B = 2
    step = jax.jit(make_serve_step(det, variables))
    shape = serve_input_shape(cfg, 1, fold=False)[1:]
    frames = _frames(cfg, 1, 4, seed=4)[:, 0]

    engine = ServingEngine(step, det.init_states(B), shape,
                           max_wait_ms=0.0)
    try:
        engine.detect("a", frames[0])
        engine.detect("b", frames[1])
        engine.detect("c", frames[2])          # evicts "a" (LRU)
        assert set(engine._slots) == {"b", "c"}
        # "a" returns: must evict "b" and be reset, matching a cold run
        d_back = engine.detect("a", frames[3])
    finally:
        engine.close()

    states = det.init_states(B)
    ev = np.zeros((B,) + shape, np.uint8)
    ev[0] = frames[3]
    _, dets, valid = step(states, jnp.asarray(ev), jnp.zeros(B, bool),
                          jnp.array([True, False]))
    want = np.asarray(dets)[0][np.asarray(valid)[0]]
    np.testing.assert_allclose(d_back, want, rtol=1e-5, atol=1e-6)


def test_engine_eviction_churn_consistency(setup):
    """Concurrent clients exceeding the slot count (eviction churn):
    every result must equal the cold-chain run of that stream's frames
    since its last reset — verifying slot isolation, reset placement,
    and state continuity under concurrent LRU eviction (VERDICT r4
    item 5). The step inputs are logged and replayed per stream."""
    import threading

    cfg, det, variables = setup
    B = 2
    S, R = 5, 4                    # 5 streams x 4 rounds over 2 slots
    raw_step = jax.jit(make_serve_step(det, variables))
    shape = serve_input_shape(cfg, 1, fold=False)[1:]
    frames = _frames(cfg, 1, S * R, seed=6)[:, 0]
    # tag each frame so logged step inputs identify it
    for i in range(S * R):
        frames[i, 0, 0, 0] = i % 251
        frames[i, 0, 0, 1] = i // 251

    log = []

    def logging_step(states, ev, reset, active):
        log.append((np.asarray(ev).copy(), np.asarray(reset).copy(),
                    np.asarray(active).copy()))
        return raw_step(states, ev, reset, active)

    engine = ServingEngine(logging_step, det.init_states(B), shape,
                           max_wait_ms=1.0)
    results = {}
    errors = []
    barrier = threading.Barrier(S)

    def client(s):
        try:
            for r in range(R):
                barrier.wait(30)
                results[(s, r)] = engine.detect(f"s{s}", frames[r * S + s])
        except BaseException as e:              # surface in main thread
            errors.append(e)

    threads = [threading.Thread(target=client, args=(s,)) for s in range(S)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
    finally:
        engine.close()
    assert not errors, errors
    assert len(results) == S * R

    # replay: walk the log, maintain the frame chain each slot carries
    # since its last reset, and check every request against a cold run
    # of exactly that chain
    def frame_id(ev_row):
        return int(ev_row[0, 0, 0]) + 251 * int(ev_row[0, 0, 1])

    expected = {}
    chains = {slot: [] for slot in range(B)}
    resets = 0
    for ev, reset, active in log:
        for slot in range(B):
            if not active[slot]:
                continue
            fid = frame_id(ev[slot])
            if reset[slot]:
                chains[slot] = [fid]
                resets += 1
            else:
                chains[slot].append(fid)
            expected[fid] = list(chains[slot])
    # churn happened: with 5 streams over 2 slots, far more resets than
    # the S first-admissions
    assert resets > S, resets

    for (s, r), got in results.items():
        chain = expected[r * S + s]
        # the engine must never have continued a stream across frames
        # that aren't the stream's own, in order
        own = [rr * S + s for rr in range(r + 1)]
        assert chain == own[-len(chain):], (s, r, chain)
        states = det.init_states(B)
        active = jnp.array([True] + [False] * (B - 1))
        ev = np.zeros((B,) + shape, np.uint8)
        for fid in chain:
            ev[0] = frames[fid]
            states, dets, valid = raw_step(states, jnp.asarray(ev),
                                           jnp.zeros(B, bool), active)
        want = np.asarray(dets)[0][np.asarray(valid)[0]]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"stream {s} round {r}")


def test_engine_rejects_bad_frame(setup):
    cfg, det, variables = setup
    step = jax.jit(make_serve_step(det, variables))
    shape = serve_input_shape(cfg, 1, fold=False)[1:]
    engine = ServingEngine(step, det.init_states(2), shape)
    try:
        with pytest.raises(ValueError):
            engine.detect("a", np.zeros((4, 4, 1), np.uint8))
    finally:
        engine.close()


def test_http_server_smoke(setup):
    """cli/serve.py's HTTP layer end-to-end on a live engine."""
    import base64
    import http.client
    import threading

    from cli.serve import make_server

    cfg, det, variables = setup
    step = jax.jit(make_serve_step(det, variables))
    shape = serve_input_shape(cfg, 1, fold=False)[1:]
    engine = ServingEngine(step, det.init_states(2), shape,
                           max_wait_ms=0.0)
    meta = artifact_meta(cfg, 2, fold=False)
    server = make_server(engine, meta, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("GET", "/v1/health")
        r = conn.getresponse()
        assert r.status == 200
        import json
        health = json.loads(r.read())
        assert health["slots"] == 2

        frame = _frames(cfg, 1, 1, seed=5)[0, 0]
        body = json.dumps({
            "stream": "cam0",
            "frame_b64": base64.b64encode(frame.tobytes()).decode(),
        })
        conn.request("POST", "/v1/detect", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200, r.read()
        out = json.loads(r.read())
        assert "boxes" in out and isinstance(out["boxes"], list)
        want = engine.detect("direct", frame)
        assert len(out["boxes"]) == len(want)
    finally:
        server.shutdown()
        engine.close()


def test_engine_resident_streams_assigned_first():
    """A micro-batch containing a NEW stream plus a RESIDENT stream must
    keep the resident's slot (evicting an idle stream), regardless of
    arrival order — otherwise the new stream LRU-evicts the resident and
    its LSTM state is reset mid-stream (serve.py _assign_batch).
    Tested deterministically against the assignment method itself."""
    from leod_tpu.serve import _Request

    B = 2
    shape = (4, 4, 2)

    def fake_step(states, ev, reset, active):
        dets = np.zeros((B, 3, 7), np.float32)
        return states, dets, np.asarray(active)[:, None] & np.ones(
            (B, 3), bool)

    zero = {"h": np.zeros((B, 2), np.float32)}
    engine = ServingEngine(fake_step, zero, shape, max_wait_ms=0.0)
    frame = np.zeros(shape, np.uint8)
    try:
        engine.detect("a", frame)
        engine.detect("b", frame)          # slots full: {a, b}, LRU=[a, b]
        slot_a = engine._slots["a"]
        # one coalesced batch with new "c" ARRIVING BEFORE resident "a"
        with engine._lock:
            rows = engine._assign_batch([_Request("c", frame),
                                         _Request("a", frame)])
        # resident "a" kept its slot and was NOT reset; idle "b" evicted
        assert rows[1] == (slot_a, False)
        assert engine._slots["a"] == slot_a
        assert "b" not in engine._slots and "c" in engine._slots
        assert rows[0][1] is True          # c starts fresh
    finally:
        engine.close()


def test_engine_timeout_withdraws_pending_request():
    """A detect() that times out while still QUEUED is withdrawn from
    _pending, so the worker never runs the abandoned frame (which would
    advance the stream's recurrent state behind the client's back)."""
    import threading

    B = 2
    shape = (4, 4, 2)
    release = threading.Event()
    entered = threading.Event()

    def slow_step(states, ev, reset, active):
        entered.set()
        release.wait(30)
        dets = np.zeros((B, 3, 7), np.float32)
        return states, dets, np.asarray(active)[:, None] & np.ones(
            (B, 3), bool)

    zero = {"h": np.zeros((B, 2), np.float32)}
    engine = ServingEngine(slow_step, zero, shape, max_wait_ms=0.0)
    frame = np.zeros(shape, np.uint8)
    try:
        # occupy the worker with x's step (blocked in slow_step)
        tx = threading.Thread(target=lambda: engine.detect("x", frame))
        tx.start()
        assert entered.wait(30)             # worker is inside slow_step
        with pytest.raises(TimeoutError):
            engine.detect("y", frame, timeout=0.2)
        with engine._lock:
            assert engine._pending == []    # y withdrawn, not zombie
        release.set()
        tx.join()
        assert "y" not in engine._slots     # y's frame never ran
    finally:
        release.set()
        engine.close()
