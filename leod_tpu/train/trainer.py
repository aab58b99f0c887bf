"""Training orchestration: loaders, jitted steps, eval, checkpoints.

Replaces the reference's PyTorch-Lightning Trainer + Module wiring
(reference: train.py:98-261, modules/detection.py) with a plain loop:
host loader threads feed device-ready batches; one jitted train step
carries the stream-state table; streaming evaluation + Prophesee COCO
metrics run at `val_check_interval`; orbax checkpoints are written on a
timer and on best-AP (reference: callbacks/custom.py:9-29).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:
    import orbax.checkpoint as ocp
except Exception:                                   # pragma: no cover
    ocp = None

from ..config import ExperimentConfig, stem_fold_hw
from ..data.loader import (EvalStreamLoader, MixedTrainLoader, Prefetcher,
                           RandomTrainLoader, StreamTrainLoader,
                           harvest_frames, open_split_sequences)
from ..eval.prophesee import PropheseeEvaluator, boxes_to_prophesee
from ..models.detector import Detector
from ..ops.nms import postprocess
from .optim import make_optimizer
from .step import TrainState, cached_eval_step, make_train_step


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Restore an orbax checkpoint as plain numpy arrays.

    Restoring as numpy is topology-independent: a checkpoint written on
    TPU restores fine on CPU (plain restore() fails with a sharding
    deserialization error across device types)."""
    ckpt = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta = ckpt.metadata(path)
    tree = meta
    for attr in ("item_metadata", "tree"):
        if hasattr(tree, attr):
            tree = getattr(tree, attr)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckpt.restore(path, restore_args=restore_args)


def load_variables(path: str) -> Dict[str, Any]:
    """Checkpoint -> model variables ({'params', 'batch_stats'}).

    The single owner of the checkpoint->variables mapping (the payload
    also carries opt_state/step/best_aps — see save_checkpoint); every
    CLI and load_weights goes through here so a layout change has one
    place to land."""
    restored = load_checkpoint(path)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}


def default_frames_per_slot(seq_len: int, use_label_every: int = 1) -> int:
    """Static per-slot harvest budget.

    Real Gen1/Gen4 GT labels arrive at <= 4 Hz vs 20 Hz reprs, so
    ceil(L/5)+1 covers them with slack. When training on pseudo-dense
    datasets with `use_label_every` subsampling, the kept pseudo frames
    are denser: budget additionally covers ceil(L/use_label_every)+1.
    Fully-dense pseudo training (use_label_every == 1) should set
    training.max_det_frames explicitly (the loader reports
    dropped_frames when the budget is too small)."""
    budget = max(2, (seq_len + 4) // 5 + 1)
    if use_label_every > 1:
        budget = max(budget, -(-seq_len // use_label_every) + 1)
    return budget


class MetricLogger:
    """JSONL + stdout metrics with pluggable remote sinks. Multi-host:
    only process 0 writes (losses/metrics are replicated, so every rank
    would log identical records — reference logs on rank 0 via
    Lightning).

    The reference's remote sink is WandB (loggers/utils.py:5-24); this
    environment has no network, so JSONL is the default and remote
    backends attach through `add_sink(fn)` — each sink is called with
    the plain-float record dict per log call. `wandb_sink()` builds the
    WandB adapter when the package is available."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._primary = jax.process_index() == 0
        self._sinks: list = []
        if path and self._primary:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def add_sink(self, sink) -> "MetricLogger":
        """Register a callable(record: dict) sink; called on process 0
        only, after JSON-float conversion. Sink exceptions are reported
        but never break training."""
        self._sinks.append(sink)
        return self

    @staticmethod
    def wandb_sink(project: str, run_name: Optional[str] = None,
                   config: Optional[Dict[str, Any]] = None):
        """WandB adapter (reference: loggers/utils.py:5-24). Raises
        ImportError when wandb is not installed."""
        import wandb

        run = wandb.init(project=project, name=run_name, config=config,
                         resume="allow")

        def sink(record: Dict[str, Any]):
            step = record.get("step")
            run.log({k: v for k, v in record.items() if k != "step"},
                    step=int(step) if step is not None else None)
        return sink

    def close(self):
        """Release the JSONL handle (idempotent). Flush-per-line in
        log() keeps the file complete even unclosed; this exists so
        long-lived processes (serving, notebooks) don't hold the fd."""
        if self._f:
            self._f.close()
            self._f = None

    def log(self, record: Dict[str, Any]):
        if not self._primary:
            return
        rec = {k: (float(v) if isinstance(v, (jnp.ndarray, np.ndarray,
                                              np.floating)) else v)
               for k, v in record.items()}
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        print(line, flush=True)
        for sink in self._sinks:
            try:
                sink(rec)
            except Exception as e:               # pragma: no cover
                print(f"metric sink error ({sink}): {e}", flush=True)


def run_streaming_eval(det: Detector, variables, cfg: ExperimentConfig,
                       split: str = "val", batch_size: Optional[int] = None,
                       frames_per_slot: Optional[int] = None,
                       conf_threshold: Optional[float] = None,
                       max_batches: Optional[int] = None,
                       time_flip: bool = False,
                       shard_index: Optional[int] = None,
                       num_shards: Optional[int] = None,
                       evaluator: Optional[PropheseeEvaluator] = None,
                       mesh=None) -> Optional[Dict[str, float]]:
    """Full streaming evaluation of a split -> Prophesee COCO metrics
    (reference: modules/detection.py:300-463, val.py).

    Multi-host: each process evaluates its own sequence shard
    (reference shards by global rank, stream_sharded_datapipe.py:88-105);
    buffers are all-gathered before the COCO eval so every host reports
    identical exact metrics. Pass shard_index/num_shards explicitly to
    override the jax.process_* defaults (e.g. for tests), and optionally
    an external `evaluator` to accumulate into (its merged contents are
    evaluated; pass one per shard + PropheseeEvaluator.merge to combine
    shards manually).

    mesh: a 1-D jax.sharding.Mesh for single-process multi-chip eval —
    batch rows (= stream slots) and the LSTM state table are sharded
    over the data axis, exactly like the training step; B must divide
    the mesh size."""
    from ..parallel.distributed import allgather_evaluator, process_shard

    if jax.process_count() > 1:
        # per-process shard evaluation is host-local work: postprocess
        # results are read back with numpy, which a global multi-host
        # array does not allow. Run on this process's local devices and
        # pull the (replicated) weights to host first.
        # host-local weights (postprocess reads results back with numpy,
        # which a global multi-host array does not allow), re-placed on
        # device ONCE — feeding jit a numpy tree would re-upload the
        # full model every batch through the tunnel
        variables = jax.tree.map(np.asarray, variables)
        if mesh is None:
            variables = jax.device_put(variables)
        else:
            from ..parallel.mesh import local_mesh
            mesh = local_mesh(mesh)

    dst = cfg.dataset
    B = batch_size or cfg.training.batch_size_eval
    seqs = open_split_sequences(
        dst, split, seq_ratio={"val": dst.val_ratio,
                               "test": dst.test_ratio}.get(split, -1.0))
    if not seqs:
        return None
    time_flip = time_flip or dst.reverse_event_order
    if shard_index is None and num_shards is None:
        shard_index, num_shards = process_shard()
        sync_metrics = True
    else:
        shard_index, num_shards = shard_index or 0, num_shards or 1
        sync_metrics = False
    B = min(B, len(seqs))
    if mesh is not None:
        from ..parallel.mesh import data_axis_size
        n_dev = data_axis_size(mesh)      # space shards hold whole rows
        if B >= n_dev:
            B = (B // n_dev) * n_dev      # batch rows must divide the axis
        else:
            mesh = None                   # fewer slots than chips
    loader = EvalStreamLoader(seqs, dst, B, time_flip=time_flip,
                              shard_index=shard_index, num_shards=num_shards)
    M = frames_per_slot or default_frames_per_slot(dst.sequence_length)
    pp = cfg.model.postprocess
    conf = conf_threshold if conf_threshold is not None else pp.confidence_threshold

    eval_step = cached_eval_step(det)
    if evaluator is None:
        evaluator = PropheseeEvaluator(dst.name, dst.downsample_by_factor_2)
    states = det.init_states(B)
    if mesh is not None:
        from ..parallel.mesh import shard_params, shard_states
        variables = shard_params(mesh, variables)
        states = shard_states(mesh, states)
    n_cls = cfg.model.head.num_classes
    prefetcher = Prefetcher(iter(loader))
    try:
        for bi, batch in enumerate(prefetcher):
            if max_batches is not None and bi >= max_batches:
                break
            while True:
                hb = harvest_frames(batch, M, cfg.model.head.max_gt,
                                    cfg.model.backbone.in_res_hw,
                                    fold_hw=stem_fold_hw(cfg.model))
                if not hb["dropped_frames"]:
                    break
                # dropped eval frames would silently bias mAP (the
                # reference harvests ragged and can never drop,
                # modules/utils/detection.py:27-58): auto-regrow the
                # static budget to this batch's demand and re-harvest.
                # M only grows, so this recompiles eval_step at most a
                # few times per run.
                M = int(hb["max_slot_frames"])
                print(f"eval harvest budget grown to {M}/slot "
                      f"(recompiling eval step)", flush=True)
            dev = {k: hb[k] for k in ("ev", "is_first", "frame_t",
                                      "frame_mask", "labels")}
            if mesh is not None:
                from ..parallel.mesh import shard_batch
                dev = shard_batch(mesh, dev)
            states, preds = eval_step(variables, states, dev)
            if hb["num_frames"] == 0:
                continue
            dets, valid = postprocess(preds, num_classes=n_cls,
                                      conf_threshold=conf,
                                      nms_threshold=pp.nms_threshold,
                                      pre_topk=pp.pre_nms_topk,
                                      max_dets=pp.max_dets)
            dets = np.asarray(dets)
            valid = np.asarray(valid)
            # rows are (b, m) flattened with b outer
            Mslot = hb["frame_t"].shape[1]
            for b in range(len(hb["boxes"])):
                for m in range(Mslot):
                    lab = hb["boxes"][b][m]
                    if lab is None:
                        continue
                    row = b * Mslot + m
                    d = dets[row][valid[row]]
                    gt, dt = boxes_to_prophesee(lab, d if len(d) else None)
                    evaluator.add_labels([gt])
                    evaluator.add_predictions([dt])
    finally:
        # join the producer even on an exception path (and on the
        # max_batches early break): an abandoned daemon thread dying
        # mid device-dispatch at interpreter exit aborts the process
        # (loader.py Prefetcher.close)
        prefetcher.close()
        for s in seqs:
            s.close()
    if sync_metrics:
        allgather_evaluator(evaluator)
    return evaluator.evaluate()


class Trainer:
    def __init__(self, cfg: ExperimentConfig, dtype=jnp.bfloat16,
                 mesh=None):
        """mesh: a jax.sharding.Mesh — 1-D for data parallelism, or
        2-D (data, space) from make_mesh(space=k) to also shard the
        activation/state height k ways — (batch and
        LSTM state table sharded, parameters replicated). None = single
        device. The reference's only parallelism is DDP (train.py:126-133);
        this is its mesh equivalent."""
        self.cfg = cfg
        self.det = Detector(cfg.model, dtype=dtype)
        self.optimizer, self.schedule = make_optimizer(cfg.training)
        self.mesh = mesh
        self.run_dir = os.path.join(cfg.save_dir, cfg.exp_name)
        os.makedirs(self.run_dir, exist_ok=True)
        self.logger = MetricLogger(os.path.join(self.run_dir, "metrics.jsonl"))
        # ASYNC checkpointer: save() returns after the device->host copy
        # and the directory write completes on a background thread, so
        # the train loop never stalls on checkpoint I/O (the reference
        # blocks training for the full Lightning save). Back-to-back
        # saves serialize inside orbax; read-back paths call
        # wait_for_checkpoints() first.
        self._ckpt = (ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                      if ocp is not None else None)
        self._stop_requested = False
        # top-2 best-AP retention (reference: callbacks/custom.py:9-29,
        # save_top_k=2): ckpt_best = argmax val/AP, ckpt_best2 = runner-up
        self._best_aps = [-1.0, -1.0]

    def close(self):
        """Release trainer-held resources: waits for in-flight async
        checkpoint writes, then closes the metrics JSONL handle.
        Idempotent; fit() can still be called again afterwards (the
        logger re-check is the only closed state, and log() on a closed
        logger still prints/sinks)."""
        self.wait_for_checkpoints()
        self.logger.close()

    def request_stop(self):
        """Ask fit() to checkpoint and exit at the next step boundary.
        Called by the SIGTERM handler fit() installs (preemption-safe
        shutdown — the reference gets this from SLURM/Lightning,
        train.py:71-95); safe to call from any thread."""
        self._stop_requested = True

    # -- state -------------------------------------------------------------
    def init_state(self, batch_size: int, seed: int = 0) -> TrainState:
        variables = self.det.init(jax.random.PRNGKey(seed), batch_size=1)
        opt_state = self.optimizer.init(variables["params"])
        states = self.det.init_states(batch_size)
        state = TrainState(variables=variables, opt_state=opt_state,
                           states=states, step=jnp.zeros((), jnp.int32))
        return self._place(state)

    def _place(self, state: TrainState) -> TrainState:
        if self.mesh is None:
            return state
        from ..parallel.mesh import replicate, shard_params, shard_states
        return TrainState(
            variables=shard_params(self.mesh, state.variables),
            opt_state=shard_params(self.mesh, state.opt_state),
            states=shard_states(self.mesh, state.states),
            step=replicate(self.mesh, state.step))

    def wait_for_checkpoints(self):
        """Block until every in-flight async checkpoint write is durable.
        Multi-host: all ranks must call this (orbax commits collectively)."""
        if self._ckpt is not None:
            self._ckpt.wait_until_finished()

    def save_checkpoint(self, state: TrainState, name: str = "last"):
        """Write ckpt_<name>. ASYNC: returns once the arrays are staged
        to host; the actual directory write finishes in the background
        (wait_for_checkpoints() makes it durable)."""
        if self._ckpt is None:
            return
        path = os.path.join(os.path.abspath(self.run_dir), f"ckpt_{name}")
        payload = {"params": state.variables["params"],
                   "batch_stats": state.variables["batch_stats"],
                   "opt_state": state.opt_state,
                   "step": state.step,
                   # top-2 retention state rides along so an auto-resume
                   # does not clobber ckpt_best with a worse model
                   "best_aps": np.asarray(self._best_aps, np.float64)}
        if jax.process_count() > 1:
            # every saved leaf is replicated, so each rank's host copy is
            # the whole checkpoint; saving numpy avoids the distributed
            # array-shard protocol. ALL ranks must still make this call —
            # orbax runs a sync_global_devices barrier inside save().
            payload = jax.tree.map(np.asarray, payload)
        self._ckpt.save(path, payload, force=True)

    def _checkpoint_candidates(self) -> list:
        """All checkpoint dirs in the run dir, newest first."""
        cands = [os.path.join(self.run_dir, d)
                 for d in os.listdir(self.run_dir)
                 if d.startswith("ckpt_") and
                 os.path.isdir(os.path.join(self.run_dir, d))]
        return sorted(cands, key=os.path.getmtime, reverse=True)

    def latest_checkpoint(self) -> Optional[str]:
        """Newest checkpoint in the run dir for preemption auto-resume
        (reference: train.py:71-95; corrupted ckpts are skipped).

        Probes candidates via orbax metadata only — for fallback on an
        ACTUAL restore failure use restore_latest()."""
        self.wait_for_checkpoints()
        for path in self._checkpoint_candidates():
            try:
                self._ckpt.metadata(os.path.abspath(path))
                return path
            except Exception as e:                     # corrupted: fall back
                print(f"skipping corrupted checkpoint {path}: {e}")
        return None

    def restore_latest(self, state: TrainState):
        """Full-resume from the newest RESTORABLE checkpoint: try-restores
        newest -> oldest and falls back past checkpoints whose payload is
        corrupted, not just ones whose metadata is unreadable (reference:
        train.py:85-92 try-loads the ckpt and falls back to the
        second-newest). Returns (state, path-or-None)."""
        self.wait_for_checkpoints()
        for path in self._checkpoint_candidates():
            try:
                return self.restore_checkpoint(path, state), path
            except Exception as e:                     # corrupted: fall back
                print(f"restore failed for {path}, falling back: {e}")
        return state, None

    def _save_best(self, ap: float, state: TrainState) -> None:
        """Keep the TWO best-AP checkpoints (reference keeps top-2 by
        val/AP plus last, callbacks/custom.py:9-29, general.yaml:33):
        a new best demotes ckpt_best -> ckpt_best2; an AP beating only
        the runner-up overwrites ckpt_best2. Filesystem moves run on
        process 0 only; the orbax save itself is a collective all ranks
        enter (it contains a global barrier)."""
        import shutil

        if ap > self._best_aps[0]:
            # the previous ckpt_best write may still be in flight — it
            # must land before the rename below moves its directory
            self.wait_for_checkpoints()
            if self._best_aps[0] >= 0 and jax.process_index() == 0:
                best = os.path.join(self.run_dir, "ckpt_best")
                best2 = os.path.join(self.run_dir, "ckpt_best2")
                shutil.rmtree(best2, ignore_errors=True)
                if os.path.isdir(best):
                    os.rename(best, best2)
            self._best_aps = [ap, self._best_aps[0]]
            self.save_checkpoint(state, "best")
        elif ap > self._best_aps[1]:
            self._best_aps[1] = ap
            self.save_checkpoint(state, "best2")

    def load_weights(self, path: str, state: TrainState) -> TrainState:
        """Weight-only resume (reference: modules/detection.py:583-594)."""
        self.wait_for_checkpoints()     # the path may still be writing
        return state._replace(variables=load_variables(path))

    def restore_checkpoint(self, path: str, state: TrainState) -> TrainState:
        """Full resume: weights + optimizer + step + best-AP retention
        state (so post-resume evals compete against the pre-preemption
        best instead of overwriting ckpt_best unconditionally).

        Restores the optimizer state against the live optax pytree
        structure (orbax round-trips namedtuples as plain dicts)."""
        self.wait_for_checkpoints()     # the path may still be writing
        restored = load_checkpoint(path)
        if "best_aps" in restored:          # absent in older checkpoints
            self._best_aps = [float(v) for v in restored["best_aps"]]
        opt_state = jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(restored["opt_state"]))
        return TrainState(
            variables={"params": restored["params"],
                       "batch_stats": restored["batch_stats"]},
            opt_state=opt_state,
            states=state.states,
            step=jnp.asarray(restored["step"]))

    # -- data ---------------------------------------------------------------
    def make_train_loader(self, seed: int = 0):
        """Returns (loader, global_batch). Under multi-host each process
        builds only its local slice of the global slot table: process p
        feeds global slots [p*B_local, (p+1)*B_local) with globally
        unique stream seeds (reference shards by rank*num_workers+worker,
        stream_sharded_datapipe.py:88-105)."""
        from ..parallel.distributed import process_shard

        cfg = self.cfg
        dst = cfg.dataset
        B = cfg.training.batch_size_train
        p, n = process_shard()
        assert B % n == 0, (B, n)
        b_local = B // n
        seqs = open_split_sequences(dst, "train", seq_ratio=dst.train_ratio)
        if cfg.training.ssod_online.enabled:
            # online SSOD needs continuous streams (the EMA teacher's
            # LSTM state tracks the weak view across windows)
            return StreamTrainLoader(seqs, dst, b_local, seed,
                                     slot_offset=p * b_local, ssod=True), B
        mode = dst.train_sampling
        if mode == "stream":
            return StreamTrainLoader(seqs, dst, b_local, seed,
                                     slot_offset=p * b_local), B
        if mode == "random":
            return RandomTrainLoader(seqs, dst, b_local, seed,
                                     slot_offset=p * b_local), B
        assert mode == "mixed"
        b_stream = max(b_local // 2, 1)
        b_rand = max(b_local - b_stream, 1)
        return MixedTrainLoader(
            StreamTrainLoader(seqs, dst, b_stream, seed,
                              slot_offset=p * b_stream),
            RandomTrainLoader(seqs, dst, b_rand, seed,
                              slot_offset=p * b_rand)), (b_stream + b_rand) * n

    # -- visualization -------------------------------------------------------
    def _viz_payload(self, hb: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """Host-side data for one pred-vs-GT panel: the first harvested
        labeled frame of the batch (ev frame copy, its GT Boxes, and the
        flat row index into the train step's preds output)."""
        mask = hb["frame_mask"]
        rows = np.argwhere(mask)
        if len(rows) == 0:
            return None
        b, m = (int(v) for v in rows[0])
        t = int(hb["frame_t"][b, m])
        ev = np.asarray(hb["ev"][t, b])
        c = self.cfg.model.backbone.input_channels
        if ev.shape[-1] == 16 * c:             # stem-folded (harvest fold_hw)
            from ..models.layers import unfold_ev_hw
            ev = unfold_ev_hw(ev)
        elif ev.shape[-1] != c:
            from ..models.layers import unfold_ev_width
            ev = unfold_ev_width(ev)
        return {"ev": ev.copy(),
                "gt": hb["boxes"][b][m],
                "row": b * mask.shape[1] + m}

    def _write_viz_panel(self, step: int, viz: Dict[str, Any],
                         preds) -> None:
        """Render pred (green) vs GT (black) boxes on the event frame
        into <run_dir>/viz/ (reference: callbacks/detection.py:20-107)."""
        from ..utils.viz import save_pred_vs_gt_panel

        pp = self.cfg.model.postprocess
        row = np.asarray(preds[viz["row"]])[None]
        dets, valid = postprocess(
            jnp.asarray(row), num_classes=self.cfg.model.head.num_classes,
            conf_threshold=pp.confidence_threshold,
            nms_threshold=pp.nms_threshold,
            pre_topk=pp.pre_nms_topk, max_dets=pp.max_dets)
        d = np.asarray(dets)[0][np.asarray(valid)[0]]
        path = os.path.join(self.run_dir, "viz", f"step{step:08d}.png")
        if save_pred_vs_gt_panel(path, viz["ev"], d, viz["gt"]):
            print(f"viz panel -> {path}", flush=True)

    # -- loop ---------------------------------------------------------------
    def fit(self, max_steps: Optional[int] = None, seed: int = 0,
            eval_split: str = "val", state: Optional[TrainState] = None,
            log_every: int = 50, profile_steps: int = 0) -> TrainState:
        """profile_steps > 0 captures a jax.profiler trace of that many
        steps (starting at step 5) into <run_dir>/profile for
        TensorBoard/XProf (SURVEY.md section 5: tracing as a first-class
        feature, unlike the reference's inert timers)."""
        cfg = self.cfg
        total = max_steps or cfg.training.max_steps
        loader, B = self.make_train_loader(seed)
        if state is None:
            state = self.init_state(B, seed)
        ssod_batcher = None
        if cfg.training.ssod_online.enabled:
            # the teacher starts as a copy of the student; on resume it
            # re-initializes from the restored student (the EMA catches
            # up within ~1/(1-alpha) steps, so teacher state is not
            # checkpointed separately)
            from ..selftrain.online import OnlineSSODBatcher
            # the loader yields this process's LOCAL slice of the global
            # batch; the teacher's slot/state table must match it
            ssod_batcher = OnlineSSODBatcher(loader, self.det,
                                             state.variables, cfg,
                                             B // jax.process_count(),
                                             start_step=int(state.step))
            loader = ssod_batcher
        # viz reads one pred row back to host; under multi-host the preds
        # array spans non-addressable devices, so panels are single-host
        viz_every = (cfg.training.viz_every_steps
                     if jax.process_count() == 1 else 0)
        train_step = jax.jit(
            make_train_step(self.det, self.optimizer,
                            with_preds=viz_every > 0,
                            remat=cfg.training.remat,
                            gradflow=cfg.training.gradflow),
            donate_argnums=(0,))
        M = (cfg.training.max_det_frames or
             (cfg.dataset.sequence_length if ssod_batcher is not None else
              default_frames_per_slot(cfg.dataset.sequence_length,
                                      cfg.model.use_label_every)))
        last_ckpt_time = time.time()
        # preemption-safe shutdown: SIGTERM -> checkpoint at the next
        # step boundary, then exit cleanly (only installable from the
        # main thread; elsewhere callers use request_stop directly)
        import signal
        prev_handler = None
        try:
            prev_handler = signal.signal(
                signal.SIGTERM, lambda sig, frame: self.request_stop())
        except ValueError:                          # not the main thread
            pass
        t0 = time.time()
        frames_seen = 0
        dropped_total = 0
        # track the step on the host: int(state.step) would force a device
        # sync every iteration and stall the input pipeline
        step = int(state.step)
        step0 = step

        def device_batches():
            """Harvest + host->device transfer inside the prefetch thread
            so they overlap with device compute."""
            for i, batch in enumerate(loader):
                hb = harvest_frames(batch, M, cfg.model.head.max_gt,
                                    cfg.model.backbone.in_res_hw,
                                    use_label_every=cfg.model.use_label_every,
                                    ignore_label=cfg.model.head.ignore_label,
                                    ignore_image=cfg.model.ignore_image,
                                    fold_hw=stem_fold_hw(cfg.model))
                dev = {k: hb[k] for k in ("ev", "is_first", "frame_t",
                                          "frame_mask", "labels")}
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch
                    dev = shard_batch(self.mesh, dev)
                else:
                    dev = jax.device_put(dev)
                meta = {"frames": batch["ev"].shape[0] * batch["ev"].shape[1],
                        "dropped_frames": hb["dropped_frames"]}
                # batch i is consumed by step (step0 + i + 1)
                if viz_every and (step0 + i + 1) % viz_every == 0:
                    meta["viz"] = self._viz_payload(hb)
                yield dev, meta

        stopped = False
        prefetcher = Prefetcher(device_batches(), depth=3)
        try:
            for dev, meta in prefetcher:
                if step >= total:
                    break
                if profile_steps and step == 5:
                    jax.profiler.start_trace(
                        os.path.join(self.run_dir, "profile"))
                state, metrics = train_step(state, dev)
                step += 1      # steps completed (host-tracked; no sync)
                if ssod_batcher is not None:
                    ssod_batcher.update_teacher(state.variables, step)
                preds = metrics.pop("preds", None)
                if meta.get("viz") is not None and preds is not None:
                    self._write_viz_panel(step, meta["viz"], preds)
                if profile_steps and step == 5 + profile_steps:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    print(f"profile trace -> {self.run_dir}/profile",
                          flush=True)
                # local frames x process_count = global frames (every
                # process feeds an equal slice of the global batch)
                frames_seen += meta["frames"] * jax.process_count()
                # running TOTAL, not per-step: drops on non-log steps
                # must not vanish (with log_every=50 a per-step field
                # could only ever surface 2% of them)
                dropped_total += meta["dropped_frames"]
                if step % log_every == 0 or step == 1:
                    dt = time.time() - t0
                    rec = {"step": step,
                           "lr": float(self.schedule(step - 1)) if callable(
                               self.schedule) else self.schedule,
                           "frames_per_s": frames_seen / max(dt, 1e-6),
                           **{k: float(v) for k, v in metrics.items()}}
                    if dropped_total:
                        rec["dropped_frames_total"] = dropped_total
                    self.logger.log(rec)
                # time-triggered checkpoint (reference: 18-min timer) and
                # preemption stop. Both decisions must be RANK-CONSISTENT:
                # orbax save runs a global barrier, so one rank saving
                # (or leaving the loop) while another proceeds into the
                # next step's collectives deadlocks the pod. Multi-host
                # evaluates on a step cadence (multihost_sync_every —
                # size it so cadence x step time stays well inside the
                # preemption grace period); rank 0's clock binds
                # everyone, any rank's stop request stops everyone.
                ckpt_due = ((time.time() - last_ckpt_time) / 60
                            >= cfg.training.ckpt_every_min)
                stop = self._stop_requested
                if jax.process_count() > 1:
                    if step % cfg.training.multihost_sync_every == 0:
                        from jax.experimental import multihost_utils
                        flags = multihost_utils.process_allgather(
                            np.asarray([ckpt_due, stop]))
                        ckpt_due = bool(flags[0, 0])
                        stop = bool(flags[:, 1].any())
                    else:
                        ckpt_due = stop = False
                if ckpt_due or stop:
                    self.save_checkpoint(state, "last")
                    last_ckpt_time = time.time()
                if stop:
                    print(f"stop requested (preemption): checkpointed at "
                          f"step {step}, exiting fit()", flush=True)
                    stopped = True
                    break
                if (cfg.training.val_check_interval and step %
                        cfg.training.val_check_interval == 0):
                    m = run_streaming_eval(self.det, state.variables, cfg,
                                           split=eval_split, mesh=self.mesh)
                    if m:
                        self.logger.log(
                            {"step": step,
                             **{f"val/{k}": v for k, v in m.items()}})
                        self._save_best(float(m["AP"]), state)
            # the stop path already wrote ckpt_last — don't rewrite it
            # during the scarce preemption grace window
            if not stopped:
                self.save_checkpoint(state, "last")
        finally:
            # join the producer thread: an abandoned daemon thread dying
            # mid device-dispatch at interpreter exit aborts the process
            prefetcher.close()
            # ckpt_last must be durable before fit() returns (a caller —
            # or the preempting scheduler — may kill the process next)
            self.wait_for_checkpoints()
            # always restore the handler and consume the stop request:
            # a stale flag or a leaked swallowing handler would make the
            # NEXT fit() exit immediately / ignore real SIGTERMs
            self._stop_requested = False
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        return state
