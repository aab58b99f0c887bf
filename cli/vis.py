#!/usr/bin/env python
"""Visualization CLI (reference entry point: vis_pred.py).

Streams sequences through the detector and writes MP4 videos with
predictions (green), below-threshold predictions (red) and GT (black)
drawn over rendered event frames.

Example:
    python cli/vis.py --synthetic --size tiny --ckpt runs/x/ckpt_last \
        --out /tmp/vis --num-seqs 1
"""
import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from leod_tpu.utils.viz import draw_boxes, render_event_frame  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base", choices=["tiny", "small", "base"])
    ap.add_argument("--path", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--split", default="test")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="./vis_out")
    ap.add_argument("--num-seqs", type=int, default=1)
    ap.add_argument("--seq-len", type=int, default=8)
    ap.add_argument("--conf", type=float, default=0.1)
    ap.add_argument("--show-conf", type=float, default=0.01,
                    help="draw boxes above this in red (filtered-out)")
    ap.add_argument("--fps", type=int, default=20)
    ap.add_argument("--reverse", action="store_true",
                    help="also run each sequence TIME-REVERSED and write a "
                         "side-by-side <name>_both.mp4 (normal | reversed "
                         "played back forwards) — reference "
                         "vis_pred.py:239-319")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from leod_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import cv2
    import jax
    import jax.numpy as jnp

    from leod_tpu.config import derive, experiment_preset, stem_width_fold
    from leod_tpu.data.loader import harvest_frames, open_split_sequences
    from leod_tpu.data.sequence import WindowedSequence
    from leod_tpu.data.synthetic import generate_dataset
    from leod_tpu.models.detector import Detector
    from leod_tpu.ops.nms import postprocess
    from leod_tpu.train.step import make_eval_step
    from leod_tpu.data.loader import collate

    cfg = experiment_preset(args.dataset, args.size)
    dst = cfg.dataset
    if args.synthetic:
        root = args.path or tempfile.mkdtemp(prefix="leod_synth_")
        if not os.path.isdir(os.path.join(root, "train")):
            generate_dataset(root, num_train=2, num_val=1, num_test=1,
                             num_reprs=64)
        dst = dataclasses.replace(dst, path=root)
    elif args.path:
        dst = dataclasses.replace(dst, path=args.path)
    dst = dataclasses.replace(dst, sequence_length=args.seq_len)
    cfg = derive(dataclasses.replace(cfg, dataset=dst))

    det = Detector(cfg.model, dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    if args.ckpt:
        # skip the model-sized jitted init: the checkpoint carries the
        # full variables tree (trainer.load_variables owns the mapping)
        from leod_tpu.train.trainer import load_variables
        variables = load_variables(args.ckpt)
    else:
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    eval_step = jax.jit(make_eval_step(det), donate_argnums=(1,))
    os.makedirs(args.out, exist_ok=True)
    seqs = open_split_sequences(dst, args.split)[: args.num_seqs]
    L = dst.sequence_length

    def render_seq(seq, time_flip=False):
        """Stream one sequence (optionally time-reversed) through the
        detector; returns the list of rendered BGR frames."""
        win = WindowedSequence(seq, L, start_from_zero=True,
                               time_flip=time_flip)
        states = det.init_states(1)
        frames = []
        for i in range(len(win)):
            batch = collate([win[i]])
            hb = harvest_frames(batch, L, cfg.model.head.max_gt,
                                cfg.model.backbone.in_res_hw,
                                fold_w=stem_width_fold(cfg.model))
            hb["frame_t"] = np.arange(L, dtype=np.int32)[None]
            hb["frame_mask"] = np.ones((1, L), bool)
            dev = {k: hb[k] for k in ("ev", "is_first", "frame_t",
                                      "frame_mask", "labels")}
            states, preds = eval_step(variables, states, dev)
            dets, valid = postprocess(
                preds, num_classes=cfg.model.head.num_classes,
                conf_threshold=args.show_conf,
                nms_threshold=cfg.model.postprocess.nms_threshold,
                pre_topk=cfg.model.postprocess.pre_nms_topk,
                max_dets=cfg.model.postprocess.max_dets)
            dets, valid = np.asarray(dets), np.asarray(valid)
            for t in range(L):
                if batch["is_padded"][0, t]:
                    continue
                img = render_event_frame(batch["ev"][t, 0])
                d = dets[t][valid[t]]
                score = d[:, 4] * d[:, 5] if len(d) else np.zeros(0)
                strong = d[score >= args.conf]
                weak = d[score < args.conf]
                draw_boxes(img, weak, (0, 0, 255))
                draw_boxes(img, strong, (0, 200, 0),
                           [f"{int(b[6])}:{b[4] * b[5]:.2f}" for b in strong])
                gt = batch["labels"][t][0]
                if gt is not None:
                    draw_boxes(img, gt.xyxy(), (0, 0, 0))
                frames.append(img)
        return frames

    def write_video(path, frames):
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             args.fps, (w, h))
        for img in frames:
            vw.write(img)
        vw.release()
        print(f"wrote {path}")

    for seq in seqs:
        name = os.path.basename(seq.seq_dir)
        frames = render_seq(seq)
        if frames:
            write_video(os.path.join(args.out, f"{name}.mp4"), frames)
        if args.reverse:
            # run the sequence time-reversed with fresh state, play the
            # result back FORWARDS, and hstack normal | reversed so
            # temporal-consistency failures are visible side by side
            # (reference: vis_pred.py:283-317)
            rev = render_seq(seq, time_flip=True)[::-1]
            n = min(len(frames), len(rev))
            if n:
                # even pad width: mp4v rounds odd frame widths, which
                # would desync the writer's size from the frames
                pad = np.full((frames[0].shape[0], 4, 3), 255, np.uint8)
                both = [np.concatenate([a, pad, b], axis=1)
                        for a, b in zip(frames[:n], rev[:n])]
                write_video(os.path.join(args.out, f"{name}_both.mp4"), both)
        seq.close()


if __name__ == "__main__":
    main()
