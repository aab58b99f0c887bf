#!/usr/bin/env python
"""Cross-framework accuracy experiment: torch reference vs leod_tpu on
the SAME synthetic Gen1-format dataset (closes the accuracy-parity loop
— the only north-star item with no direct evidence, since no real
Prophesee data or pretrained reference checkpoint exists in this
environment).

Two probes, both from the SAME initial weights (reference-initialized,
converted torch->jax with leod_tpu.convert):

  1. EVAL-STACK PARITY: one set of weights evaluated through both FULL
     eval stacks — the reference model driven by a faithful transcription
     of Module._val_test_step_impl (reference: modules/detection.py:
     300-401: per-timestep forward_backbone with slot-keyed RNN states,
     ragged labeled-frame harvest, batched forward_detect, the
     reference's own postprocess() NMS from boxes.py:30-86) vs
     leod_tpu.run_streaming_eval. Both prediction streams score through
     the Prophesee protocol + COCO evaluator (differentially fuzzed vs a
     pycocotools oracle, tests/test_coco_fuzz.py). Identical weights
     must give near-identical per-class AP.

  2. TRAIN-TRAJECTORY PARITY: both frameworks train for --steps on the
     IDENTICAL batch stream (no augmentation, constant LR, AdamW wd=0,
     grad clip 1.0 by value — reference train.py:236, general.yaml) from
     the same init; per-step losses are compared, then the final weights
     of EACH framework are evaluated through its OWN eval stack.

  3. SOFT-STUDENT PARITY (--soft-steps > 0, default on): the probe-2
     torch-trained model becomes the TEACHER. Pseudo labels are
     generated once with leod_tpu's PseudoLabelRunner (itself
     differentially validated against the reference writer,
     tests/test_pseudo_ref.py) from the converted teacher weights; then
     BOTH frameworks re-train from the same teacher on the IDENTICAL
     pseudo batch stream with the ignore-region loss (reference
     rnndet-soft: ignore_bbox_thresh [0.7, 0.35], config/model/
     rnndet-soft.yaml + yolo_head.py:776-972 get_losses_w_ignore).
     Per-step soft losses are compared, and each soft student is
     evaluated on the withheld-GT val split through both eval stacks.

The dataset geometry (L=4 windows, labels every 4 reprs starting at
repr 3) puts exactly ONE labeled frame in every window, so both
frameworks run their detection heads on the exact same frame set and
BatchNorm sees identical batches — removing harvest-padding as a
confound.

Usage:
    python tools/e2e_parity.py [--steps 200] [--eval-only]
Prints a summary; exits non-zero if any AP delta exceeds 0.5 (the
north-star tolerance).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

H, W = 64, 96
B = 4
L = 4
MAX_GT = 8
AP_KEYS = ("AP", "AP_50", "AP_75", "AP_car", "AP_pedestrian")


def build_cfg(root: str):
    from leod_tpu.config import (AugmentConfig, BackboneConfig,
                                 ExperimentConfig, HeadConfig, ModelConfig,
                                 TrainingConfig, ZoomConfig, dataset_preset)

    no_aug = AugmentConfig(prob_hflip=0.0, prob_tflip=0.0, rotate_prob=0.0,
                           zoom=ZoomConfig(prob=0.0))
    dst = dataclasses.replace(
        dataset_preset("gen1"), path=root, resolution_hw=(H, W),
        sequence_length=L, train_sampling="stream",
        augment_stream=no_aug, augment_random=no_aug)
    model = ModelConfig(
        backbone=BackboneConfig(embed_dim=32, in_res_hw=(H, W),
                                partition_size=(2, 3)),
        head=HeadConfig(num_classes=2, max_gt=MAX_GT))
    training = TrainingConfig(
        learning_rate=2e-4, weight_decay=0.0, gradient_clip_val=1.0,
        batch_size_train=B, batch_size_eval=B, val_check_interval=0)
    training = dataclasses.replace(
        training,
        lr_scheduler=dataclasses.replace(training.lr_scheduler, use=False))
    return ExperimentConfig(dataset=dst, model=model, training=training,
                            save_dir=root, exp_name="parity")


def make_reference():
    """Reference model at the shared tiny config, perturbed from default
    init so every converted leaf is exercised."""
    import torch
    from ref_shim import import_reference_detector, reference_model_config

    RefDet = import_reference_detector()
    ref = RefDet(reference_model_config())
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
    return ref


def convert_ref(ref):
    from leod_tpu.convert import convert_torch_state_dict

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    return convert_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# Torch side: transcriptions of the reference Module loops
# ---------------------------------------------------------------------------

def _reset_torch_states(states, is_first: np.ndarray):
    import torch

    if states is None:
        return None
    idx = torch.from_numpy(np.asarray(is_first, bool))
    with torch.no_grad():
        for h, c in states:
            h[idx] = 0.0
            c[idx] = 0.0
    return states


def _harvest_torch(batch, feats, t, sel: dict, labels_rows: list):
    """BackboneFeatureSelector semantics (reference: modules/utils/
    detection.py:27-58): t-major, b-inner collection of labeled frames."""
    for b in range(len(batch["labels"][t])):
        lab = batch["labels"][t][b]
        if lab is not None and len(lab) > 0:
            for s, f in feats.items():
                sel.setdefault(s, []).append(f[b])
            labels_rows.append(lab)


def ref_streaming_eval(ref, cfg, split: str = "val", conf: float = 0.001,
                       batch_size: int = B) -> dict:
    """Reference streaming eval transcription
    (modules/detection.py:300-401, val.py conf 0.001): slot-keyed RNN
    states, per-timestep backbone, ragged harvest, batched detect, the
    reference's own postprocess() NMS, Prophesee bridge + COCO eval."""
    import torch
    from models.detection.yolox.utils.boxes import postprocess  # reference

    from leod_tpu.data.loader import EvalStreamLoader, open_split_sequences
    from leod_tpu.eval.prophesee import PropheseeEvaluator, boxes_to_prophesee

    dst = cfg.dataset
    n_cls = cfg.model.head.num_classes
    seqs = open_split_sequences(dst, split)
    loader = EvalStreamLoader(seqs, dst, min(batch_size, len(seqs)))
    evaluator = PropheseeEvaluator(dst.name, dst.downsample_by_factor_2)
    ref.eval()
    states = None
    with torch.no_grad():
        for batch in loader:
            states = _reset_torch_states(states, batch["is_first"])
            sel: dict = {}
            labels_rows: list = []
            for t in range(dst.sequence_length):
                x = torch.from_numpy(
                    batch["ev"][t].astype(np.float32))     # [B, C, H, W]
                feats, states = ref.forward_backbone(x, states)
                _harvest_torch(batch, feats, t, sel, labels_rows)
            if not labels_rows:
                continue
            batched = {s: torch.stack(v) for s, v in sel.items()}
            preds, _ = ref.forward_detect(batched)
            dets = postprocess(preds, num_classes=n_cls, conf_thre=conf,
                               nms_thre=cfg.model.postprocess.nms_threshold)
            for i, lab in enumerate(labels_rows):
                d = dets[i].numpy() if dets[i] is not None else None
                gt, dt = boxes_to_prophesee(lab, d)
                evaluator.add_labels([gt])
                evaluator.add_predictions([dt])
    for s in seqs:
        s.close()
    return evaluator.evaluate()


def ref_train(ref, batches, lr: float) -> list:
    """Reference training transcription (modules/detection.py:150-298 +
    train.py:236: AdamW, grad clip 1.0 BY VALUE, TBPTT detach between
    batches). Returns per-step loss floats; mutates `ref` in place."""
    import torch

    from leod_tpu.data.labels import pad_yolox_batch

    opt = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=0.0)
    ref.train()
    states = None
    losses = []
    for batch in batches:
        states = _reset_torch_states(states, batch["is_first"])
        opt.zero_grad()
        sel: dict = {}
        labels_rows: list = []
        for t in range(L):
            x = torch.from_numpy(batch["ev"][t].astype(np.float32))
            feats, states = ref.forward_backbone(x, states)
            _harvest_torch(batch, feats, t, sel, labels_rows)
        assert labels_rows, "every train window must carry a label"
        batched = {s: torch.stack(v) for s, v in sel.items()}
        n_max = max(len(r) for r in labels_rows)
        targets = torch.from_numpy(pad_yolox_batch(labels_rows, n_max))
        _, loss_dict = ref.forward_detect(batched, targets=targets)
        loss_dict["loss"].backward()
        torch.nn.utils.clip_grad_value_(ref.parameters(), 1.0)
        opt.step()
        states = [(h.detach(), c.detach()) for h, c in states]
        losses.append(float(loss_dict["loss"].detach()))
    return losses


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------

def jax_train(det, variables, batches, cfg, budget: int = 1) -> tuple:
    """leod_tpu training on the identical batch stream. Returns
    (per-step losses, final variables). `budget`: labeled frames
    harvested per slot (1 for the GT geometry; L for full-dense pseudo
    windows)."""
    import jax
    import jax.numpy as jnp

    from leod_tpu.data.loader import harvest_frames
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState, make_train_step

    optimizer, _ = make_optimizer(cfg.training)
    state = TrainState(variables=variables,
                       opt_state=optimizer.init(variables["params"]),
                       states=det.init_states(B, jnp.float32),
                       step=jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(det, optimizer))
    losses = []
    for batch in batches:
        hb = harvest_frames(batch, budget, MAX_GT, (H, W), fold_w=1)
        assert hb["dropped_frames"] == 0 and bool(hb["frame_mask"].all()), (
            f"parity geometry violated: expected exactly {budget} "
            "label(s) per slot (padded harvest rows would skew BatchNorm "
            "statistics vs the reference's ragged harvest)")
        dev = {k: jnp.asarray(hb[k]) for k in
               ("ev", "is_first", "frame_t", "frame_mask", "labels")}
        state, metrics = step_fn(state, dev)
        losses.append(float(metrics["loss"]))
    return losses, jax.device_get(state.variables)


def jax_streaming_eval(det, variables, cfg, conf: float = 0.001) -> dict:
    from leod_tpu.train.trainer import run_streaming_eval

    return run_streaming_eval(det, variables, cfg, split="val",
                              conf_threshold=conf)


# ---------------------------------------------------------------------------
# Probe 3: soft-student (ignore-region loss) cross-framework round
# ---------------------------------------------------------------------------

SOFT_IGNORE_THRESH = (0.7, 0.35)    # reference config/model/rnndet-soft.yaml


def make_soft_reference(teacher):
    """Fresh reference model with the rnndet-soft head config (routes
    forward_detect -> get_losses_w_ignore, yolo_head.py:385-416,776-972)
    carrying the teacher's weights (incl. BN running stats)."""
    from ref_shim import import_reference_detector, reference_model_config

    RefDet = import_reference_detector()
    soft = RefDet(reference_model_config(
        head_kwargs={"ignore_bbox_thresh": list(SOFT_IGNORE_THRESH)}))
    soft.load_state_dict(teacher.state_dict())
    return soft


def build_soft_cfg(pseudo_root: str):
    """Parity config over the pseudo dataset with the rnndet-soft head."""
    cfg = build_cfg(pseudo_root)
    head = dataclasses.replace(cfg.model.head,
                               ignore_bbox_thresh=SOFT_IGNORE_THRESH)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, head=head))


def generate_pseudo(det, teacher_vars, cfg, pseudo_root: str) -> dict:
    """Pseudo-label the train split with leod_tpu's runner (hflip TTA,
    tracking + inpainting — the writer is differentially validated in
    tests/test_pseudo_ref.py). Low thresholds keep the label field dense
    AND rich in sub-(0.7/0.35)-confidence boxes, which is exactly what
    exercises the ignore path downstream."""
    import jax

    from leod_tpu.selftrain.pseudo_labeler import PseudoLabelConfig
    from leod_tpu.selftrain.runner import PseudoLabelRunner

    pl_cfg = PseudoLabelConfig(obj_thresh=(0.1, 0.1), cls_thresh=(0.1, 0.1),
                               min_track_len=3, tta_hflip=True)
    runner = PseudoLabelRunner(det, jax.device_put(teacher_vars), cfg,
                               pl_cfg, pseudo_root)
    return runner.run()


def collect_dense_batches(cfg, steps: int, seed: int = 1) -> list:
    """Shared soft-train batch stream, filtered to FULL-DENSE windows
    (every slot labeled at all L timesteps). Ragged windows would feed
    the reference's ragged harvest a different BatchNorm batch than our
    static-budget gather (whose padded rows enter BN) — density removes
    that confound, mirroring probe 2's 1-label-per-window geometry."""
    from leod_tpu.data.loader import StreamTrainLoader, open_split_sequences

    seqs = open_split_sequences(cfg.dataset, "train")
    loader = StreamTrainLoader(seqs, cfg.dataset, B, seed=seed)
    batches, seen = [], 0
    it = iter(loader)
    while len(batches) < steps and seen < max(20 * steps, 200):
        batch = next(it)
        seen += 1
        # <= MAX_GT too: our static pad truncates beyond the budget while
        # the reference's ragged pad keeps everything — an overfull frame
        # would silently train the two sides on different box sets
        if all(l is not None and 0 < len(l) <= MAX_GT
               for row in batch["labels"] for l in row):
            batches.append(batch)
    for s in seqs:
        s.close()
    print(f"  dense-window yield: {len(batches)}/{seen} windows scanned")
    assert len(batches) >= min(steps, 10), (
        "teacher too weak for a dense pseudo stream — raise --steps")
    return batches


# ---------------------------------------------------------------------------

def _delta_table(name, a, b):
    print(f"\n== {name} ==")
    print(f"{'metric':<18}{'reference':>12}{'leod_tpu':>12}{'delta':>12}")
    worst = 0.0
    for k in AP_KEYS:
        d = abs(a[k] - b[k])
        worst = max(worst, d)
        print(f"{k:<18}{a[k]:>12.4f}{b[k]:>12.4f}{d:>12.4f}")
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--soft-steps", type=int, default=None,
                    help="soft-student probe steps (default: --steps; "
                         "0 disables probe 3)")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--root", default=None,
                    help="existing synthetic dataset root (else generated)")
    args = ap.parse_args()
    soft_steps = args.steps if args.soft_steps is None else args.soft_steps

    import jax
    jax.config.update("jax_platforms", "cpu")   # torch-comparable numerics
    import jax.numpy as jnp

    from leod_tpu.data.loader import StreamTrainLoader, open_split_sequences
    from leod_tpu.data.synthetic import generate_dataset
    from leod_tpu.models.detector import Detector

    root = args.root
    if root is None:
        root = tempfile.mkdtemp(prefix="leod_parity_")
        print(f"generating synthetic dataset at {root}")
        generate_dataset(root, num_train=4, num_val=4, num_test=0,
                         num_reprs=64, label_every=4, first_label_repr=3,
                         hw=(H, W))
    cfg = build_cfg(root)

    print("building reference model + converting weights ...")
    ref = make_reference()
    variables = convert_ref(ref)
    det = Detector(cfg.model, dtype=jnp.float32)

    t0 = time.time()
    worst = 0.0

    # -- probe 1: eval-stack parity at identical (init) weights --
    m_ref = ref_streaming_eval(ref, cfg)
    m_jax = jax_streaming_eval(det, variables, cfg)
    worst = max(worst, _delta_table(
        "eval-stack parity @ shared INIT weights", m_ref, m_jax))

    results = {"eval_init": {"ref": m_ref, "jax": m_jax}}

    if not args.eval_only:
        # -- probe 2: train-trajectory parity on the identical stream --
        seqs = open_split_sequences(cfg.dataset, "train")
        loader = StreamTrainLoader(seqs, cfg.dataset, B, seed=0)
        it = iter(loader)
        batches = [next(it) for _ in range(args.steps)]
        for s in seqs:
            s.close()

        print(f"\ntraining both frameworks for {args.steps} steps ...")
        jl, trained_vars = jax_train(det, variables, batches, cfg)
        print(f"  leod_tpu done ({time.time() - t0:.0f}s)")
        rl = ref_train(ref, batches, cfg.training.learning_rate)
        print(f"  reference done ({time.time() - t0:.0f}s)")

        rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(rl, jl)]
        k = min(20, len(rel))
        print("\nloss trajectory (step: ref / jax):")
        for i in range(0, len(rl), max(len(rl) // 10, 1)):
            print(f"  {i:>4}: {rl[i]:.4f} / {jl[i]:.4f}")
        print(f"mean |dloss|/loss over first {k} steps : "
              f"{np.mean(rel[:k]):.4%}")
        print(f"mean |dloss|/loss over all {len(rel)} steps: "
              f"{np.mean(rel):.4%} (SimOTA's dynamic-k assignment is "
              f"discrete, so fp accumulation differences occasionally flip "
              f"an anchor and the trajectories drift apart over steps)")

        # -- eval-stack parity at identical TRAINED weights: convert the
        # torch-trained model and run it through both full stacks --
        m_ref_t = ref_streaming_eval(ref, cfg)
        vars_t = jax.device_put(convert_ref(ref))
        m_jax_same = jax_streaming_eval(det, vars_t, cfg)
        worst = max(worst, _delta_table(
            "eval-stack parity @ shared TRAINED weights (torch-trained, "
            "converted)", m_ref_t, m_jax_same))

        # -- final AP of each framework's OWN training through its OWN
        # stack (end-to-end outcome comparison) --
        m_jax_t = jax_streaming_eval(det, jax.device_put(trained_vars), cfg)
        worst = max(worst, _delta_table(
            f"end-to-end AP after {args.steps} independently-trained steps",
            m_ref_t, m_jax_t))
        results["train"] = {"loss_ref": rl, "loss_jax": jl,
                            "eval_ref": m_ref_t,
                            "eval_jax_same_weights": m_jax_same,
                            "eval_jax": m_jax_t}

        if soft_steps > 0:
            # -- probe 3: soft-student round from the probe-2 teacher --
            print(f"\npseudo-labeling the train split with the torch-"
                  f"trained teacher (converted) ...")
            pseudo_root = os.path.join(root, "pseudo")
            teacher_vars = convert_ref(ref)
            quality = generate_pseudo(det, teacher_vars, cfg, pseudo_root)
            if quality:
                print("  pseudo quality: " + ", ".join(
                    f"{k.split('/')[-1]}={v:.3f}"
                    for k, v in sorted(quality.items())
                    if "AP" in k or "prec" in k or "recall" in k))

            cfg_soft = build_soft_cfg(pseudo_root)
            det_soft = Detector(cfg_soft.model, dtype=jnp.float32)
            batches_s = collect_dense_batches(cfg_soft, soft_steps)

            print(f"soft-training both frameworks for {len(batches_s)} "
                  f"steps (ignore_bbox_thresh {SOFT_IGNORE_THRESH}) ...")
            jls, student_vars = jax_train(det_soft, teacher_vars,
                                          batches_s, cfg_soft, budget=L)
            print(f"  leod_tpu done ({time.time() - t0:.0f}s)")
            ref_soft = make_soft_reference(ref)
            rls = ref_train(ref_soft, batches_s,
                            cfg.training.learning_rate)
            print(f"  reference done ({time.time() - t0:.0f}s)")

            rel_s = [abs(a - b) / max(abs(a), 1e-9)
                     for a, b in zip(rls, jls)]
            ks = min(20, len(rel_s))
            print("\nsoft loss trajectory (step: ref / jax):")
            for i in range(0, len(rls), max(len(rls) // 10, 1)):
                print(f"  {i:>4}: {rls[i]:.4f} / {jls[i]:.4f}")
            print(f"mean |dloss|/loss over first {ks} steps : "
                  f"{np.mean(rel_s[:ks]):.4%}")
            print(f"mean |dloss|/loss over all {len(rel_s)} steps: "
                  f"{np.mean(rel_s):.4%}")

            # soft students on the withheld-GT val split, both stacks
            m_ref_s = ref_streaming_eval(ref_soft, cfg)
            m_jax_s_same = jax_streaming_eval(
                det, jax.device_put(convert_ref(ref_soft)), cfg)
            worst = max(worst, _delta_table(
                "eval-stack parity @ shared SOFT-STUDENT weights "
                "(torch-trained, converted)", m_ref_s, m_jax_s_same))
            m_jax_s = jax_streaming_eval(
                det, jax.device_put(student_vars), cfg)
            worst = max(worst, _delta_table(
                f"end-to-end AP after {len(batches_s)} independently-"
                "soft-trained steps", m_ref_s, m_jax_s))
            results["soft"] = {"loss_ref": rls, "loss_jax": jls,
                               "pseudo_quality": quality,
                               "eval_ref": m_ref_s,
                               "eval_jax_same_weights": m_jax_s_same,
                               "eval_jax": m_jax_s}

    out = os.path.join(root, "e2e_parity.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nresults -> {out}")
    print(f"worst AP delta: {worst:.4f} (north-star tolerance 0.5)")
    if worst > 0.5:
        sys.exit(1)


if __name__ == "__main__":
    main()
