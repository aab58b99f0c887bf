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


def timed(name, fn, init_carry, iters=20):
    """fn(carry) -> carry. The carry MUST feed every part of fn or XLA
    hoists the invariant work out of the timing loop."""
    out = jax.jit(lambda c0: jax.lax.scan(
        lambda c, _: (fn(c), None), c0, None, length=iters)[0])
    r = out(init_carry)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = out(init_carry)
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
    x = jnp.zeros((B, h, w // 4, 80), jnp.bfloat16)
    states = det.init_states(B)

    feats, _ = jax.jit(det.forward_backbone)(v, x, states)

    def bump_input(base, carry_leaf):
        """Make the input depend on the carry so nothing is hoisted.
        Comparison against a huge constant is always false at runtime but
        XLA cannot fold it away."""
        bump = (carry_leaf.reshape(-1)[0].astype(jnp.float32) > 1e30)
        return base + bump.astype(base.dtype)

    # full backbone step
    def bb(states):
        f, ns = det.forward_backbone(v, bump_input(x, states[0][0]), states)
        return ns

    t_bb = timed("backbone step", bb, states)

    # per-stage
    from leod_tpu.models.backbone import RVTStage
    xi = x
    cfgb = cfg.model.backbone
    stage_times = []
    for k in range(4):
        stage = RVTStage(cfgb, cfgb.stage_dims[k],
                         cfgb.patch_size if k == 0 else 2,
                         cfgb.num_blocks[k], dtype=jnp.bfloat16)
        st = (jnp.zeros_like(feats[k + 1]), jnp.zeros_like(feats[k + 1]))
        sv = jax.jit(stage.init)(jax.random.PRNGKey(k), xi, st)

        def stage_fn(s, sv=sv, xi=xi, stage=stage):
            return stage.apply(sv, bump_input(xi, s[0]), s)[1]

        stage_times.append(timed(
            f"  stage{k + 1} {tuple(feats[k + 1].shape[1:])}", stage_fn, st))
        xi = feats[k + 1]

    # fpn + head: carry the input features through the loop
    def det_fn(f):
        preds, _ = det.forward_detect(v, f, train=False)
        bump = (preds[0, 0, 0].astype(jnp.float32) > 1e30)
        return {s: ff + bump.astype(ff.dtype) for s, ff in f.items()}

    fpn_in = {s: feats[s] for s in (2, 3, 4)}
    t_head = timed("fpn+head+decode", det_fn, fpn_in)

    print(f"\nsum stages: {sum(stage_times) * 1e3:.2f} ms; "
          f"backbone-only ceiling: {B / t_bb:.0f} frames/s")


if __name__ == "__main__":
    main()
