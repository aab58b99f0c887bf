#!/usr/bin/env python
"""Model-FLOPs-utilization (MFU) for the flagship inference + train
workloads.

FLOP counts come from XLA's own cost analysis of the compiled
executables (jax Compiled.cost_analysis), so they track the model
exactly; times come from the same on-device carry-dependent loops
bench.py uses. Peak is the v5e bf16 MXU figure by default
(override PEAK_TFLOPS for other parts).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e bf16


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):                 # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def main():
    import bench
    from leod_tpu.config import experiment_preset
    from leod_tpu.models.detector import Detector
    from leod_tpu.train.optim import make_optimizer
    from leod_tpu.train.step import TrainState, make_train_step

    cfg = experiment_preset("gen1", "base")
    det = Detector(cfg.model, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0), batch_size=1)

    B, L = 16, 21
    h, w = cfg.model.backbone.in_res_hw

    def infer(variables, ev, states):
        def body(carry, x_t):
            _, ns = det.forward_backbone(variables, x_t.astype(det.dtype),
                                         carry)
            return ns, None
        states, _ = jax.lax.scan(body, states, ev[:-1])
        feats, states = det.forward_backbone(
            variables, ev[-1].astype(det.dtype), states)
        preds, _ = det.forward_detect(variables, feats, train=False)
        return preds, states

    ev = (jax.random.uniform(jax.random.PRNGKey(1), (L, B, h, w // 4, 80))
          * 32).astype(jnp.uint8)
    states = det.init_states(B)
    compiled = jax.jit(infer).lower(variables, ev, states).compile()
    fl = _flops(compiled)
    preds, st = compiled(variables, ev, states)
    jax.block_until_ready(preds)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        preds, st = compiled(variables, ev, st)
    jax.block_until_ready(preds)
    dt = (time.perf_counter() - t0) / iters
    print(f"inference window (B={B}, L={L}): {fl / 1e9:.1f} GFLOP, "
          f"{dt * 1e3:.1f} ms  -> {fl / dt / 1e12:.2f} TFLOP/s = "
          f"{fl / dt / 1e12 / PEAK_TFLOPS * 100:.1f}% MFU")

    # train step at the Gen1 recipe
    B, M, G = 8, 6, cfg.model.head.max_gt
    optimizer, _ = make_optimizer(cfg.training)
    state = TrainState(variables=variables,
                       opt_state=optimizer.init(variables["params"]),
                       states=det.init_states(B),
                       step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    labels = np.zeros((B, M, G, 7), np.float32)
    labels[:, :, 0] = [0, 150, 120, 60, 40, 1, 1]
    batch = {
        "ev": jnp.asarray(rng.integers(0, 50, (L, B, h, w // 4, 80)),
                          jnp.uint8),
        "is_first": jnp.zeros((B,), bool),
        "frame_t": jnp.asarray(
            np.tile(np.linspace(3, L - 1, M, dtype=np.int32), (B, 1))),
        "frame_mask": jnp.ones((B, M), bool),
        "labels": jnp.asarray(labels),
    }
    step_fn = make_train_step(det, optimizer,
                              remat=os.environ.get("BENCH_REMAT", "full"))
    compiled = jax.jit(step_fn).lower(state, batch).compile()
    fl = _flops(compiled)
    state, m = compiled(state, batch)
    jax.block_until_ready(m["loss"])
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = compiled(state, batch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (bs={B}, L={L}, remat="
          f"{os.environ.get('BENCH_REMAT', 'full')}): "
          f"{fl / 1e9:.1f} GFLOP, {dt * 1e3:.1f} ms  -> "
          f"{fl / dt / 1e12:.2f} TFLOP/s = "
          f"{fl / dt / 1e12 / PEAK_TFLOPS * 100:.1f}% MFU")


if __name__ == "__main__":
    main()
