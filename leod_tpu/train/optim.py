"""Optimizer + LR schedule.

Reference: AdamW + linear OneCycle with warmup pct 0.005, div_factor 25,
final_lr = max_lr / final_div_factor (note: NOT torch's init_lr/final_div
— the reference redefines it, modules/detection.py:485-518 and
config/general.yaml), gradient clip 1.0 BY VALUE (train.py:236).
"""
from __future__ import annotations

import optax

from ..config import TrainingConfig


def onecycle_linear(max_lr: float, total_steps: int, pct_start: float,
                    div_factor: float, final_div_factor: float):
    """Pointwise-exact torch OneCycleLR(anneal='linear') with the
    reference's final_div reinterpretation (detection.py:499-501):
    peak at step pct_start*total - 1, min max_lr/final_div at the LAST
    step (torch interpolates to total_steps - 1; verified against torch
    in tests/test_optim_parity.py)."""
    warmup = max(round(total_steps * pct_start) - 1, 1)
    return optax.join_schedules([
        optax.linear_schedule(max_lr / div_factor, max_lr, warmup),
        optax.linear_schedule(max_lr, max_lr / final_div_factor,
                              max(total_steps - 1 - warmup, 1)),
    ], [warmup])


def make_optimizer(cfg: TrainingConfig):
    if cfg.lr_scheduler.use:
        schedule = onecycle_linear(cfg.learning_rate, cfg.max_steps,
                                   cfg.lr_scheduler.pct_start,
                                   cfg.lr_scheduler.div_factor,
                                   cfg.lr_scheduler.final_div_factor)
    else:
        schedule = cfg.learning_rate
    tx = optax.chain(
        optax.clip(cfg.gradient_clip_val) if cfg.gradient_clip_val else
        optax.identity(),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    return tx, schedule
