#!/usr/bin/env python
"""Component-level inference timing on the real TPU.

Times each stage of the flagship model separately (on-device loops, so
tunnel dispatch latency is excluded) to direct kernel optimization work.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, iters=20):
    out = jax.jit(lambda *a: jax.lax.scan(
        lambda c, _: (fn(*a), None), fn(*args), None, length=iters)[0])
    r = out(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = out(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.2f} ms/iter")
    return dt


def main():
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector

    B = int(os.environ.get("PROF_BATCH", "16"))
    cfg = experiment_preset("gen1", "base")
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    v = det.init(jax.random.PRNGKey(0), batch_size=1)
    h, w = cfg.model.backbone.in_res_hw
    x = jnp.zeros((B, h, w, 20), jnp.bfloat16)
    states = det.init_states(B)

    feats, _ = jax.jit(det.forward_backbone)(v, x, states)

    # full backbone step
    def bb(v, x, states):
        f, ns = det.forward_backbone(v, x, states)
        return ns

    t_bb = timed("backbone step", lambda s: bb(v, x, s), states)

    # per-stage
    from leod_tpu.models.backbone import RVTStage
    xi = x
    cfgb = cfg.model.backbone
    for k in range(4):
        stage = RVTStage(cfgb, cfgb.stage_dims[k],
                         cfgb.patch_size if k == 0 else 2,
                         cfgb.num_blocks[k], dtype=jnp.bfloat16)
        st = (jnp.zeros_like(feats[k + 1]), jnp.zeros_like(feats[k + 1]))
        sv = stage.init(jax.random.PRNGKey(k), xi, st)
        timed(f"  stage{k + 1} "
              f"{tuple(feats[k + 1].shape[1:])}",
              lambda s, sv=sv, xi=xi, stage=stage: stage.apply(sv, xi, s)[1],
              st)
        xi = feats[k + 1]

    # fpn + head on one frame per batch row
    def det_fn(f):
        preds, _ = det.forward_detect(v, f, train=False)
        # return something state-shaped for the scan trick
        return {k: ff for k, ff in f.items()}

    fpn_in = {s: feats[s] for s in (2, 3, 4)}
    timed("fpn+head+decode", det_fn, fpn_in)

    print(f"\nbackbone-only ceiling: {B / t_bb:.0f} frames/s")


if __name__ == "__main__":
    main()
