"""Jitted train / eval step factories.

TPU-first structure of the reference training step
(reference: modules/detection.py:150-298):

  * the L-timestep backbone loop is a `lax.scan` with rematerialized
    body (TBPTT: carried states come out of the step and are reused,
    gradients never flow across step boundaries),
  * ragged "labeled frame harvesting" (reference BackboneFeatureSelector,
    modules/utils/detection.py:27-58) becomes a static-budget gather of
    (t, b) pairs computed on host,
  * FPN + head + SimOTA run once over the gathered frames.

All functions are pure; `donate` the states/opt-state at the jit level.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.backbone import BackboneStates, reset_states
from ..models.detector import Detector


class TrainState(NamedTuple):
    variables: Dict[str, Any]
    opt_state: Any
    states: BackboneStates     # stream-slot LSTM table [B_slots, ...]
    step: jnp.ndarray


_REMAT_POLICIES = {
    # recompute everything in the backward scan pass (lowest memory)
    "full": None,
    # save matmul/conv outputs, recompute elementwise/layout work:
    # trades HBM for a much cheaper backward at Gen1 activation sizes
    "dots": "dots_with_no_batch_dims_saveable",
    # recompute only stage 1's downsample+attention (the bulk of the
    # activation bytes at 4x resolution); stages 2-4 store residuals
    "stage1": "stage1",
    # no remat: XLA stores all scan-body residuals (fastest if it fits)
    "none": (),
}


def _remat_body(body, policy: str):
    """Wrap a scan body per the TBPTT remat policy (see _REMAT_POLICIES)."""
    if policy in ("none", "stage1"):      # stage1 checkpoints inside body
        return body
    name = _REMAT_POLICIES[policy]
    kw = {} if name is None else {
        "policy": getattr(jax.checkpoint_policies, name)}
    return functools.partial(jax.checkpoint, prevent_cse=False, **kw)(body)


def _scan_backbone(det: Detector, variables, states0, ev_seq,
                   prebatch_stage1: bool = False, fused: bool = False,
                   remat: str = "full", unroll: int = 1):
    """Scan the backbone over time; returns FPN-stage features per step.

    ev_seq [L, B, H, W, C] (any dtype; cast to compute dtype here).
    Returns (final_states, {2: [L,B,...], 3: ..., 4: ...}).

    prebatch_stage1: run stage 1's non-recurrent downsample+attention on
    all L*B frames in ONE batched call before the scan. Measured on v5e
    this is ~7% SLOWER for training (storing the big stage-1 activations
    for the backward costs more HBM traffic than remat recompute), and
    XLA already performs the equivalent pipelining for inference — so it
    stays off by default; kept as an option for future hardware.

    remat: TBPTT rematerialization policy for the scan body
    ("full" | "dots" | "none", see _REMAT_POLICIES).

    unroll: lax.scan unroll factor; unroll == L emits straight-line HLO
    (no while loop), which tools/mfu.py uses to get exact cost-analysis
    op counts (the rolled loop's counts ignore the trip count).
    """
    stages = det.cfg.fpn.in_stages

    if remat == "stage1" and (det.cfg.backbone.enable_masking
                              or prebatch_stage1):
        # neither variant has a stage-1 checkpoint boundary; silently
        # storing ALL residuals would invert the requested memory policy
        remat = "full"

    if prebatch_stage1 and not det.cfg.backbone.enable_masking:
        L, B = ev_seq.shape[:2]
        flat = ev_seq.reshape((L * B,) + ev_seq.shape[2:])
        y1 = det.forward_stage1_pre(variables, flat)
        y1 = y1.reshape((L, B) + y1.shape[1:])

        def body(carry, y_t):
            feats, new_states = det.forward_from_stage1(variables, y_t, carry)
            return new_states, tuple(feats[s] for s in stages)

        final_states, feats_seq = jax.lax.scan(_remat_body(body, remat),
                                               states0, y1, unroll=unroll)
        return final_states, dict(zip(stages, feats_seq))

    if remat == "stage1":
        # recompute only the stage-1 attention stack in the backward
        # pass; the (much smaller) stage 2-4 residuals are stored
        stage1_pre = functools.partial(jax.checkpoint, prevent_cse=False)(
            lambda x: det.forward_stage1_pre(variables, x))

        def body(carry, x_t):
            y1 = stage1_pre(x_t.astype(det.dtype))
            feats, new_states = det.forward_from_stage1(variables, y1, carry)
            return new_states, tuple(feats[s] for s in stages)
    else:
        def body(carry, x_t):
            feats, new_states = det.forward_backbone(
                variables, x_t.astype(det.dtype), carry, fused=fused)
            return new_states, tuple(feats[s] for s in stages)

    final_states, feats_seq = jax.lax.scan(_remat_body(body, remat),
                                           states0, ev_seq, unroll=unroll)
    return final_states, dict(zip(stages, feats_seq))


def _gather_frames(feats_seq: Dict[int, jnp.ndarray], frame_t: jnp.ndarray):
    """Per-slot time gather: feats [L, B, h, w, c] + frame_t [B, M] ->
    [B*M, h, w, c] with the batch axis outermost.

    Gathering along time only (never across batch rows) keeps the gather
    local to each data-parallel shard — no cross-device collectives."""
    def one(f):
        g = jax.vmap(lambda f_b, t_b: f_b[t_b], in_axes=(1, 0))(f, frame_t)
        return g.reshape((-1,) + g.shape[2:])
    return {s: one(f) for s, f in feats_seq.items()}


def make_train_step(det: Detector, optimizer, with_preds: bool = False,
                    remat: str = "full", unroll: int = 1,
                    gradflow: bool = False):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: ev [L,B,H,W,C], is_first [B], frame_t [B,M], frame_mask [B,M],
    labels [B,M,G,7]. All shapes static across steps.

    with_preds: metrics additionally carry "preds" [B*M, A, 5+C]
    (eval-style sigmoided detections for the harvested frames) for the
    train-time pred-vs-GT visualization hook (reference:
    callbacks/detection.py:20-107). Costs nothing unless fetched.

    remat: TBPTT remat policy for the backbone scan (TrainingConfig.remat).
    unroll: backbone-scan unroll factor (see _scan_backbone; cost tools).
    gradflow: also emit per-PARAMETER mean |grad| under
    "gradflow/<dotted path>" (reference: callbacks/gradflow.py:10-27
    logs a per-parameter |grad| bar chart) — hundreds of scalars per
    step, so off by default; the coarse per-module norms always ride.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        states0 = reset_states(state.states, batch["is_first"])
        batch_stats = state.variables["batch_stats"]

        def loss_fn(params):
            v = {"params": params, "batch_stats": batch_stats}
            final_states, feats_seq = _scan_backbone(det, v, states0,
                                                     batch["ev"],
                                                     remat=remat,
                                                     unroll=unroll)
            feats = _gather_frames(feats_seq, batch["frame_t"])
            out, new_stats = det.forward_detect(v, feats, train=True)
            labels = batch["labels"].reshape((-1,) + batch["labels"].shape[2:])
            losses = det.loss(out, labels, batch["frame_mask"].reshape(-1))
            return losses["loss"], (losses, new_stats, final_states, out)

        grads, (losses, new_stats, final_states, out) = jax.grad(
            loss_fn, has_aux=True)(state.variables["params"])
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.variables["params"])
        params = optax.apply_updates(state.variables["params"], updates)
        new_state = TrainState(
            variables={"params": params, "batch_stats": new_stats},
            opt_state=opt_state,
            states=jax.lax.stop_gradient(final_states),
            step=state.step + 1,
        )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        # per-module gradient norms (reference: callbacks/gradflow.py)
        for mod in ("backbone", "fpn", "head"):
            metrics[f"grad_norm/{mod}"] = optax.global_norm(grads[mod])
        if gradflow:
            flat, _ = jax.tree_util.tree_flatten_with_path(grads)
            for path, g in flat:
                name = ".".join(str(getattr(k, "key", k)) for k in path)
                metrics[f"gradflow/{name}"] = jnp.mean(jnp.abs(g))
        if with_preds:
            out = jax.lax.stop_gradient(out)
            metrics["preds"] = jnp.concatenate(
                [out[..., :4], jax.nn.sigmoid(out[..., 4:])], axis=-1)
        return new_state, metrics

    return train_step


def cached_eval_step(det: Detector):
    """jit(make_eval_step(det), donate_argnums=(1,)) memoized on the
    Detector. jax.jit caches by FUNCTION IDENTITY and make_eval_step
    returns a new closure per call, so an unmemoized jit re-traces (and
    on a compile-cache miss recompiles) the full eval program at every
    val_check_interval; one Detector's eval program never changes."""
    fn = getattr(det, "_cached_eval_step", None)
    if fn is None:
        fn = jax.jit(make_eval_step(det), donate_argnums=(1,))
        det._cached_eval_step = fn
    return fn


def make_eval_step(det: Detector):
    """Returns eval_step(variables, states, batch) ->
    (new_states, preds [M, A, 5+C] sigmoided).

    Streaming evaluation: states persist across calls per slot
    (reference: modules/detection.py:300-401)."""

    def eval_step(variables, states: BackboneStates,
                  batch: Dict[str, jnp.ndarray]):
        states0 = reset_states(states, batch["is_first"])
        final_states, feats_seq = _scan_backbone(
            det, variables, states0, batch["ev"],
            fused=det.fused_inference)
        feats = _gather_frames(feats_seq, batch["frame_t"])
        preds, _ = det.forward_detect(variables, feats, train=False)
        return final_states, preds

    return eval_step
