#!/usr/bin/env python
"""Train-step timing on the real TPU (data resident on device).

Times the full jitted training step (backbone scan + backward + AdamW)
for the Gen1 recipe, comparing the pre-batched stage-1 scan against the
plain per-step scan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState, _scan_backbone, make_train_step

    size = os.environ.get("PROF_SIZE", "base")
    B = int(os.environ.get("PROF_BATCH", "8"))
    L = int(os.environ.get("PROF_SEQ_LEN", "21"))
    M, G = 6, 32
    cfg = experiment_preset("gen1", size)
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)
    optimizer, _ = make_optimizer(cfg.training)
    h, w = cfg.model.backbone.in_res_hw

    rng = np.random.default_rng(0)
    labels = np.zeros((B, M, G, 7), np.float32)
    labels[:, :, :2] = [0, 150, 120, 40, 30, 1, 1]
    batch = {
        "ev": jnp.asarray(rng.integers(0, 40, (L, B, h, w // 4, 80)),
                          jnp.uint8),
        "is_first": jnp.zeros(B, bool),
        "frame_t": jnp.asarray(
            np.tile(np.linspace(2, L - 1, M).astype(np.int32), (B, 1))),
        "frame_mask": jnp.ones((B, M), bool),
        "labels": jnp.asarray(labels),
    }

    for prebatch in (False, True):
        import leod_tpu.train.step as step_mod
        orig = step_mod._scan_backbone

        def patched(det_, v, s, e, _pb=prebatch, **kw):
            kw.pop("prebatch_stage1", None)
            return orig(det_, v, s, e, prebatch_stage1=_pb, **kw)

        step_mod._scan_backbone = patched
        train_step = jax.jit(step_mod.make_train_step(
            det, optimizer, remat=os.environ.get("PROF_REMAT", "full")))
        state = TrainState(variables=variables,
                           opt_state=optimizer.init(variables["params"]),
                           states=det.init_states(B),
                           step=jnp.zeros((), jnp.int32))
        state, m = train_step(state, batch)          # compile
        jax.block_until_ready(m["loss"])
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        step_mod._scan_backbone = orig
        print(f"prebatch_stage1={prebatch}: {dt * 1e3:.1f} ms/step "
              f"({B * L / dt:.0f} frames/s)")


if __name__ == "__main__":
    main()
