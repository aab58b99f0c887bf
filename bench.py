#!/usr/bin/env python
"""Benchmark: RVT-B streaming inference throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 2,000 event-frames/s/chip (BASELINE.md north star,
Gen1-specific). BENCH_DATASET=gen4 reproduces the 1Mpx number.

Measures the full detection path the way eval runs it: lax.scan of the
recurrent backbone over L timesteps with carried LSTM state + FPN/head
on the final frame, bf16, stem-folded input, batch B. The workload
builders are shared with tools/mfu.py so both tools measure the same
program.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FRAMES_PER_S = 2000.0


def build_infer(det):
    """infer(variables, ev, states, bump) — one L-frame streaming
    window: backbone scan over ALL L steps + detect on the final frame
    (the eval cadence on Gen1 is ~1 labeled frame per window). FPN-stage
    features ride the scan carry, exactly like the eval path's gather —
    slicing `ev[:-1]` for a separate last step costs a full-window u8
    copy (~4.5% measured, tools/trace_agg.py).

    `bump` (scalar, derived from a timing-loop carry; pass 0 outside
    on-device loops) is added to the model input AFTER the uint8->bf16
    cast so it fuses into the stem's elementwise input processing —
    bumping the uint8 window itself materializes a full-window copy +
    slice every iteration (~5% measured harness overhead)."""
    import jax
    import jax.numpy as jnp

    def infer(variables, ev, states, bump):
        fused = det.fused_inference

        def body(carry, x_t):
            states, _ = carry
            feats, ns = det.forward_backbone(
                variables, x_t.astype(det.dtype) + bump, states, fused=fused)
            return (ns, feats), None

        feats0 = jax.eval_shape(
            lambda v, x, s: det.forward_backbone(v, x, s)[0],
            variables, ev[0].astype(det.dtype), states)
        feats0 = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), feats0)
        (states, feats), _ = jax.lax.scan(
            body, (states, feats0), ev,
            unroll=int(os.environ.get("BENCH_UNROLL", "1")))
        preds, _ = det.forward_detect(variables, feats, train=False)
        return preds, states
    return infer


def make_ev(cfg, B, L, seed: int = 1):
    """Synthetic uint8 event window stem-folded exactly like the host
    loader ships it (docs/benchmarks.md): both-axis space-to-depth
    [L, B, H/fh, W/fw, fh*fw*C] by default, BENCH_FOLD=w for the
    width-only layout, BENCH_FOLD=none for raw NHWC."""
    import jax
    import jax.numpy as jnp
    from leod_tpu.config import stem_fold_hw

    h, w = cfg.model.backbone.in_res_hw
    c = cfg.model.backbone.input_channels
    fh, fw = stem_fold_hw(cfg.model)
    mode = os.environ.get("BENCH_FOLD", "hw")
    if mode == "w":
        fh = 1
    elif mode == "none":
        fh = fw = 1
    elif mode != "hw":
        raise SystemExit(f"BENCH_FOLD={mode!r}: expected hw|w|none")
    return (jax.random.uniform(jax.random.PRNGKey(seed),
                               (L, B, h // fh, w // fw, fh * fw * c))
            * 32).astype(jnp.uint8)


def build_train_setup(cfg, det, B: int = 8, M: int = 0, variables=None):
    """(state, batch, optimizer) for the train recipe on synthetic
    data — shared by the throughput and MFU tools. Pass already-init
    `variables` to avoid a redundant jitted init (each one is an extra
    compile+run through the remote-TPU tunnel).

    M (labeled frames harvested per slot) defaults to the budget the
    real Trainer derives for the recipe (default_frames_per_slot):
    6 for gen1 L=21, 2 for gen4 L=5 — benching a fixed M=6 at gen4
    charged the step 3x the recipe's head+SimOTA work. Pass M
    explicitly to pin it (tools/mfu.py pins the production M across
    its probe lengths so the calibration residual stays fixed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState
    from leod_tpu.train.trainer import default_frames_per_slot

    L = cfg.dataset.sequence_length
    if M <= 0:
        M = default_frames_per_slot(L, cfg.model.use_label_every)
    G = cfg.model.head.max_gt
    if variables is None:
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    optimizer, _ = make_optimizer(cfg.training)
    state = TrainState(variables=variables,
                       opt_state=optimizer.init(variables["params"]),
                       states=det.init_states(B),
                       step=jnp.zeros((), jnp.int32))
    labels = np.zeros((B, M, G, 7), np.float32)
    labels[:, :, 0] = [0, 150, 120, 60, 40, 1, 1]
    labels[:, :, 1] = [1, 40, 30, 24, 20, 1, 1]
    batch = {
        "ev": make_ev(cfg, B, L, seed=0),
        "is_first": jnp.zeros((B,), bool),
        "frame_t": jnp.asarray(
            np.tile(np.linspace(3, L - 1, M, dtype=np.int32), (B, 1))),
        "frame_mask": jnp.ones((B, M), bool),
        "labels": jnp.asarray(labels),
    }
    return state, batch, optimizer


def _throughput(cfg, det, variables, B: int, L: int, iters: int) -> float:
    """Streaming-inference frames/s: on-device repeat loop of the
    L-window infer program (host dispatch latency through the remote-TPU
    tunnel stays out of the measurement).

    The model input is perturbed by the carried state so none of the
    per-frame network work is loop-invariant — otherwise XLA hoists the
    carry-independent stage-1 work out of the loop and inflates the
    number."""
    import jax

    infer = build_infer(det)

    def run_iters(variables, ev, states):
        def body(carry, _):
            # cheap data dependency: one element of the carried LSTM state
            bump = (carry[0][0][0, 0, 0, 0] > 0).astype(det.dtype)
            preds, states = infer(variables, ev, carry, bump)
            return states, preds[0, 0, 0]
        states, outs = jax.lax.scan(body, states, None, length=iters)
        return outs, states

    run_iters = jax.jit(run_iters, donate_argnums=(2,))
    ev = make_ev(cfg, B, L)
    states = det.init_states(B)

    # warmup / compile
    outs, states = run_iters(variables, ev, states)
    outs.block_until_ready()

    t0 = time.perf_counter()
    outs, states = run_iters(variables, ev, states)
    outs.block_until_ready()
    dt = time.perf_counter() - t0
    return iters * B * L / dt


def _bench_dataset(dataset: str, iters: int, latency: bool,
                   train: bool, use_env_workload: bool = True,
                   pseudogen: bool = False, serve: bool = False) -> dict:
    """All per-dataset numbers: throughput (+ optional b1 latency
    mean/p50/p99 and train-step throughput).

    use_env_workload=False pins the reference workload (ride-along gen4
    run): env overrides meant for the primary dataset — workload
    (BENCH_BATCH/BENCH_SEQ_LEN/BENCH_SIZE) and kernel/layout probes
    (BENCH_FUSED/BENCH_FOLD/BENCH_UNROLL) alike — must not silently
    change the gen4 fields the driver compares round over round."""
    if not use_env_workload:
        pinned = ("BENCH_FUSED", "BENCH_FOLD", "BENCH_UNROLL",
                  "BENCH_SIZE", "BENCH_BATCH", "BENCH_SEQ_LEN",
                  "BENCH_REMAT")
        saved = {k: os.environ.pop(k) for k in pinned if k in os.environ}
        try:
            return _bench_dataset(dataset, iters, latency, train)
        finally:
            os.environ.update(saved)

    import jax
    import jax.numpy as jnp

    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector

    fused_env = os.environ.get("BENCH_FUSED", "0")
    fused = {"0": False, "1": True, "stage": "stage",
             "stage1": "stage1"}.get(fused_env)
    if fused is None:
        raise SystemExit(f"BENCH_FUSED={fused_env!r}: expected 0|1|stage|"
                         f"stage1")
    size = os.environ.get("BENCH_SIZE", "base")
    cfg = experiment_preset(dataset, size)
    det = Detector(cfg.model, dtype=jnp.bfloat16, fused_inference=fused)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    # gen4 defaults mirror the reference workload (bs 8, L=5;
    # /root/reference/docs/benchmark.md:16 — the reference repo's file,
    # not this repo's docs/benchmarks.md); gen1 (bs 16, L=21) is the
    # headline config
    B_def = "16" if dataset == "gen1" else "8"
    L_def = "21" if dataset == "gen1" else "5"
    B = int(os.environ.get("BENCH_BATCH", B_def))
    L = int(os.environ.get("BENCH_SEQ_LEN", L_def))
    out = {"frames_per_s": round(
        _throughput(cfg, det, variables, B, L, iters), 2)}
    if latency:
        try:
            mean_ms, p50_ms, p95_ms, p99_ms, n = _b1_latency(
                cfg, det, variables)
            out["b1_latency_ms"] = round(mean_ms, 3)
            if p50_ms is not None:
                out["b1_latency_p50_ms"] = round(p50_ms, 3)
                out["b1_latency_p95_ms"] = round(p95_ms, 3)
                out["b1_latency_p99_ms"] = round(p99_ms, 3)
                out["b1_latency_n"] = n
        except Exception as e:                      # pragma: no cover
            out["latency_error"] = f"{type(e).__name__}: {e}"
    if train:
        try:
            out["train_frames_per_s"] = round(
                _train_throughput(cfg, det, variables), 2)
        except Exception as e:                      # pragma: no cover
            out["train_error"] = f"{type(e).__name__}: {e}"
    if pseudogen:
        try:
            out.update(_pseudogen_throughput(cfg, det, variables))
        except Exception as e:                      # pragma: no cover
            out["pseudogen_error"] = f"{type(e).__name__}: {e}"
    if serve:
        try:
            out.update(_serve_load(cfg, det, variables))
        except Exception as e:                      # pragma: no cover
            out["serve_error"] = f"{type(e).__name__}: {e}"
    return out


def _pseudogen_throughput(cfg, det, variables, iters: int = 8) -> dict:
    """Measured end-to-end pseudo-label-generation throughput (VERDICT
    r4 item 3; reference headline: 0.45 it/s x bs16 x L21 = ~151
    frames/s on a T4, /root/reference/docs/benchmark.md:83).

    Replicates the runner's per-batch program (selftrain/runner.py
    _run_pass): backbone scan over the hflip-DOUBLED batch (B_dev = 2B
    rows), ALL L timesteps harvested through the head, fixed-shape NMS —
    in an on-device repeat loop (data resident; the remote-tunnel
    h5-upload is an environment artifact, CLAUDE.md) — PLUS the host
    filter/recorder consume path (_consume: pred_to_label thresholds +
    FOV filters + hflip-back + SequenceRecorder bookkeeping) timed on
    realistic detections. The headline composes them serially, exactly
    like the runner's loop (device step -> fetch -> consume).

    Frames counted = B*L real stream frames per iteration: the hflip
    doubling is TTA cost (not extra frames), while a tflip second pass
    streams distinct (reversed) frames and is counted by the reference's
    iteration tally the same way, so frames/s is directly comparable."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from leod_tpu.ops.nms import postprocess as nms_postprocess
    from leod_tpu.train.step import _gather_frames

    B = int(os.environ.get("BENCH_PSEUDO_BATCH", "8"))
    L = cfg.dataset.sequence_length
    B_dev = 2 * B
    pp = cfg.model.postprocess
    n_cls = cfg.model.head.num_classes
    stages = det.cfg.fpn.in_stages
    frame_t = jnp.tile(jnp.arange(L, dtype=jnp.int32), (B_dev, 1))

    def pg_step(variables, ev, states, bump):
        def body(carry, x_t):
            feats, ns = det.forward_backbone(
                variables, x_t.astype(det.dtype) + bump, carry,
                fused=det.fused_inference)
            return ns, tuple(feats[s] for s in stages)

        states, feats_seq = jax.lax.scan(body, states, ev)
        feats = _gather_frames(dict(zip(stages, feats_seq)), frame_t)
        preds, _ = det.forward_detect(variables, feats, train=False)
        dets, valid = nms_postprocess(
            preds, num_classes=n_cls, conf_threshold=pp.confidence_threshold,
            nms_threshold=pp.nms_threshold, pre_topk=pp.pre_nms_topk,
            max_dets=pp.max_dets)
        return states, dets, valid

    def run(variables, ev, states):
        def body(carry, _):
            bump = (carry[0][0][0, 0, 0, 0] > 0).astype(det.dtype)
            states, dets, valid = pg_step(variables, ev, carry, bump)
            return states, dets[0, 0, 0]
        states, outs = jax.lax.scan(body, states, None, length=iters)
        return outs, states

    run = jax.jit(run, donate_argnums=(2,))
    ev = make_ev(cfg, B_dev, L)
    states = det.init_states(B_dev)
    outs, states = run(variables, ev, states)
    outs.block_until_ready()
    t0 = time.perf_counter()
    outs, states = run(variables, ev, states)
    outs.block_until_ready()
    dev_fps = iters * B * L / (time.perf_counter() - t0)

    host_fps = _pseudogen_host_consume(cfg, B, L)
    return {
        "pseudogen_frames_per_s": round(1 / (1 / dev_fps + 1 / host_fps), 2),
        "pseudogen_device_frames_per_s": round(dev_fps, 2),
        "pseudogen_host_frames_per_s": round(host_fps, 2),
        "pseudogen_batch": B,
    }


def _pseudogen_host_consume(cfg, B: int, L: int, iters: int = 20) -> float:
    """Host-side frames/s of the runner's consume path on realistic
    detections: threshold/FOV filters, hflip-back re-alignment, and
    SequenceRecorder bookkeeping for both views of every frame."""
    import tempfile

    import numpy as np

    from leod_tpu.selftrain.pseudo_labeler import PseudoLabelConfig
    from leod_tpu.selftrain.runner import PseudoLabelRunner

    pp = cfg.model.postprocess
    pl = PseudoLabelConfig(tta_hflip=True)
    runner = PseudoLabelRunner.__new__(PseudoLabelRunner)
    runner.cfg, runner.pl = cfg, pl
    runner.recorders = {}
    runner._gt_pairs = ([], [])
    hw = cfg.dataset.loading_hw

    rng = np.random.default_rng(0)
    n_box = 12
    dets = np.zeros((2 * B * L, pp.max_dets, 7), np.float32)
    x0 = rng.uniform(0, hw[1] - 60, (2 * B * L, n_box))
    y0 = rng.uniform(0, hw[0] - 40, (2 * B * L, n_box))
    dets[:, :n_box, 0], dets[:, :n_box, 1] = x0, y0
    dets[:, :n_box, 2], dets[:, :n_box, 3] = x0 + 50, y0 + 30
    dets[:, :n_box, 4:6] = rng.uniform(0.5, 1.0, (2 * B * L, n_box, 2))
    dets[:, :n_box, 6] = rng.integers(0, 2, (2 * B * L, n_box))
    valid = np.zeros((2 * B * L, pp.max_dets), bool)
    valid[:, :n_box] = True

    tmp = tempfile.mkdtemp(prefix="leod_pg_host_")
    base = {
        "paths": [os.path.join(tmp, f"seq_{b:03d}") for b in range(B)],
        "is_padded": np.zeros((B, L), bool),
        "labels": [[None] * B for _ in range(L)],
        "skipped": [[None] * B for _ in range(L)],
        "is_last": np.zeros(B, bool),
    }
    lens = np.full(B, 100, np.int64)           # past skip_first_t

    def one(i):
        batch = dict(base, ev_idx=np.tile(
            np.arange(i * L, (i + 1) * L, dtype=np.int64), (B, 1)))
        runner._consume(batch, dets, valid, L, B, True, False, hw, lens)

    one(0)                                      # warm the recorder map
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        one(i)
    return iters * B * L / (time.perf_counter() - t0)


def _serve_load(cfg, det, variables, slots: int = 8, streams: int = 24,
                iters: int = 40) -> dict:
    """ServingEngine under eviction churn (VERDICT r4 item 5): `streams`
    concurrent clients over `slots` state-table rows — streams > slots
    forces LRU eviction/readmission every round. Latency is
    client-visible (enqueue -> result: coalescing wait + device step +
    host readback) and includes the remote-TPU tunnel dispatch in this
    environment, so the absolute numbers upper-bound a co-located
    deployment."""
    import threading

    import numpy as np

    import jax

    from leod_tpu.serve import (ServingEngine, make_serve_step,
                                serve_input_shape)

    step_fn = jax.jit(make_serve_step(det, variables))
    engine = ServingEngine(step_fn, det.init_states(slots),
                           serve_input_shape(cfg, slots)[1:],
                           max_wait_ms=2.0)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 40, engine.frame_shape).astype(np.uint8)
    try:
        engine.detect("warm", frame)            # compile
        with engine._lock:
            engine._lat.clear()                 # drop the compile sample

        def client(s):
            for _ in range(iters):
                engine.detect(f"cam{s}", frame)

        threads = [threading.Thread(target=client, args=(s,))
                   for s in range(streams)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        st = engine.stats()
    finally:
        engine.close()
    return {
        "serve_slots": slots,
        "serve_streams": streams,
        "serve_req_per_s": round(streams * iters / wall, 1),
        "serve_latency_p50_ms": round(st["latency_ms_p50"], 3),
        "serve_latency_p95_ms": round(st["latency_ms_p95"], 3),
        "serve_latency_p99_ms": round(st["latency_ms_p99"], 3),
    }


def _chip_available(timeout_s: float) -> dict:
    """Bounded health probe (tools/tpu_health.py in a capped subprocess).
    A wedged chip makes the axon claim wait FOREVER (CLAUDE.md
    grant-wedge notes), which would otherwise hang the whole bench run
    with no artifact; probing first turns an outage into one parseable
    JSON error line. BENCH_HEALTH_TIMEOUT=0 skips the probe."""
    import subprocess
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "tpu_health.py")
    try:
        out = subprocess.run([sys.executable, tool, "--timeout",
                              str(timeout_s)], capture_output=True,
                             text=True, timeout=timeout_s + 30)
        lines = out.stdout.strip().splitlines()
        return json.loads(lines[-1]) if lines else \
            {"ok": False, "reason": f"no probe output (rc {out.returncode})"}
    except Exception as e:                              # pragma: no cover
        return {"ok": False, "reason": f"{type(e).__name__}: {e}"}


def main():
    dataset = os.environ.get("BENCH_DATASET", "gen1")
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    latency = os.environ.get("BENCH_LATENCY", "1") != "0"
    train = os.environ.get("BENCH_TRAIN", "1") != "0"

    health_timeout = float(os.environ.get("BENCH_HEALTH_TIMEOUT", "900"))
    if health_timeout > 0:
        status = _chip_available(health_timeout)
        if not status.get("ok"):
            print(json.dumps({
                "metric": f"rvt_b_{dataset}_inference_throughput",
                "value": None,
                "unit": "event_frames_per_s_per_chip",
                "error": f"tpu unavailable: {status.get('reason')} "
                         f"(probe capped at {health_timeout:.0f}s)"}))
            return

    # pseudo-generation + serving-load riders (gen1 headline only):
    # measured numbers for the self-training bottleneck and the
    # client-visible serving tail land in every round's artifact
    pseudogen = (dataset == "gen1"
                 and os.environ.get("BENCH_PSEUDOGEN", "1") != "0")
    serve = dataset == "gen1" and os.environ.get("BENCH_SERVE", "1") != "0"
    res = _bench_dataset(dataset, iters, latency, train,
                         pseudogen=pseudogen, serve=serve)
    frames_per_s = res.pop("frames_per_s")
    record = {
        "metric": f"rvt_b_{dataset}_inference_throughput",
        "value": frames_per_s,
        "unit": "event_frames_per_s_per_chip",
    }
    if dataset == "gen1":
        # the 2,000 frames/s north star is Gen1-specific (BASELINE.md);
        # a ratio against it would mislead for other presets
        record["vs_baseline"] = round(frames_per_s / BASELINE_FRAMES_PER_S, 4)
    record.update(res)
    if dataset == "gen1" and os.environ.get("BENCH_GEN4", "1") != "0":
        # 1Mpx numbers ride along in the same artifact so gen4
        # regressions are driver-visible round over round
        try:
            g4 = _bench_dataset("gen4", iters, latency, train,
                                use_env_workload=False)
            record.update({f"gen4_{k}": v for k, v in g4.items()})
        except Exception as e:                      # pragma: no cover
            record["gen4_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(record))


def _trace_step_percentiles(out_dir: str, iters: int):
    """(p50_ms, p95_ms, p99_ms, n) per-iteration durations of an
    on-device repeat loop, recovered from a jax.profiler device trace:
    pick the device-lane op that recurs once per iteration with the
    largest total time and diff its start timestamps (iterations
    serialize through the carried state, so consecutive starts bound
    each step). `n` is the number of per-iteration duration samples the
    percentiles are computed from — a p99 is only meaningful when n is
    >= ~1000 (VERDICT r3 item 4). Returns (None,)*4 if no per-iteration
    marker op is found."""
    import numpy as np

    from leod_tpu.utils.trace import is_scan_wrapper, load_device_events

    path, _, dev_events = load_device_events(out_dir)
    if path is None:
        return None, None, None, None
    starts: dict = {}
    durs: dict = {}
    for e in dev_events:
        name = e.get("name", "?")
        if is_scan_wrapper(name):
            continue
        starts.setdefault(name, []).append(e.get("ts", 0))
        durs[name] = durs.get(name, 0.0) + e.get("dur", 0)
    best, stride = None, 1
    for name, ts in starts.items():
        # an op may run k>=1 times per iteration; take every k-th start
        k, r = divmod(len(ts), iters)
        if r == 0 and 1 <= k <= 8:
            if best is None or durs[name] > durs[best]:
                best, stride = name, k
    if best is None:
        return None, None, None, None
    ts = np.sort(np.asarray(starts[best], np.float64))[::stride]
    d = np.diff(ts) / 1e3                              # us -> ms
    if len(d) < 8:
        return None, None, None, None
    return (float(np.percentile(d, 50)), float(np.percentile(d, 95)),
            float(np.percentile(d, 99)), int(len(d)))


def _b1_latency(cfg, det, variables=None, iters: int = 1024):
    """Per-frame detect latency at batch 1. One frame = backbone step +
    FPN + head + decode with carried LSTM state — the real-time streaming
    cadence. Returns (mean_ms, p50_ms, p95_ms, p99_ms, n): the mean
    comes from host-timing an on-device loop (per-call host timing
    through the remote-TPU tunnel would measure the tunnel); the
    p50/p95/p99 the BASELINE.md north star names come from
    per-iteration timestamps in a jax.profiler device trace of the same
    loop (None if trace capture is unavailable), with `n` the sample
    count behind them. iters defaults to 1024 so the p99 rests on >=1k
    per-iteration samples rather than being a renamed p50 (VERDICT r3
    item 4); the host-visible tunnel-inclusive tail is a separate
    measurement (tools/profile_serve.py). The loop is state-carried so
    iterations serialize."""
    import shutil
    import tempfile

    import jax

    def one_frame(variables, x, states, bump):
        feats, states = det.forward_backbone(
            variables, x.astype(det.dtype) + bump, states,
            fused=det.fused_inference)
        preds, _ = det.forward_detect(variables, feats, train=False)
        return preds, states

    def run(variables, x, states):
        def body(carry, _):
            bump = (carry[0][0][0, 0, 0, 0] > 0).astype(det.dtype)
            preds, states = one_frame(variables, x, carry, bump)
            return states, preds[0, 0, 0]
        states, outs = jax.lax.scan(body, states, None, length=iters)
        return outs, states

    if variables is None:
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    run = jax.jit(run, donate_argnums=(2,))
    x = make_ev(cfg, 1, 1)[0]
    states = det.init_states(1)
    outs, states = run(variables, x, states)
    outs.block_until_ready()
    t0 = time.perf_counter()
    outs, states = run(variables, x, states)
    outs.block_until_ready()
    mean_ms = (time.perf_counter() - t0) / iters * 1e3
    p50 = p95 = p99 = n = None
    tmp = tempfile.mkdtemp(prefix="leod_b1_trace_")
    try:
        with jax.profiler.trace(tmp):
            outs, states = run(variables, x, states)
            outs.block_until_ready()
        p50, p95, p99, n = _trace_step_percentiles(tmp, iters)
    except Exception:                                  # pragma: no cover
        pass                     # trace capture unsupported: mean only
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return mean_ms, p50, p95, p99, n


def _train_throughput(cfg, det, variables=None, iters: int = 4):
    """On-device train-step throughput at the Gen1 recipe (bs 8, L=21,
    AdamW + remat scan) so backward/scan-path perf regressions are
    visible round over round (BENCH_TRAIN=0 skips)."""
    import jax
    import jax.numpy as jnp

    from leod_tpu.train.step import make_train_step

    B = 8
    L = cfg.dataset.sequence_length
    # donate_argnums=(0,) below frees the whole train state INCLUDING
    # its param arrays, and TrainState aliases the caller's `variables`
    # tree — the riders that run after this section still need those
    # buffers, so the train state gets its own copy
    if variables is not None:
        variables = jax.tree.map(jnp.copy, variables)
    state, batch, optimizer = build_train_setup(cfg, det, B=B,
                                                variables=variables)
    train_step = make_train_step(
        det, optimizer, remat=os.environ.get("BENCH_REMAT", "full"))

    def run(state, ev):
        """No input bump needed here: params update every iteration, so
        the whole forward+backward is already loop-carried — only the
        uint8->bf16 input cast can hoist, which a real training loop
        would also amortize."""
        def body(carry, _):
            st, metrics = train_step(carry, {**batch, "ev": ev})
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=iters)

    run = jax.jit(run, donate_argnums=(0,))
    state, losses = run(state, batch["ev"])
    losses.block_until_ready()
    t0 = time.perf_counter()
    state, losses = run(state, batch["ev"])
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    return iters * B * L / dt


if __name__ == "__main__":
    main()
