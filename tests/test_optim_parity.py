"""LR-schedule parity: onecycle_linear vs torch OneCycleLR.

The reference trains with torch OneCycleLR(anneal_strategy='linear')
and REINTERPRETS final_div_factor as final_lr = max_lr/final_div
(modules/detection.py:485-518: final_div_factor_pytorch = final/div).
Our optax schedule must reproduce it pointwise, warmup boundary and
final step included — an LR-trajectory offset silently changes every
training run.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from leod_tpu.train.optim import onecycle_linear


@pytest.mark.parametrize("total,pct", [(1000, 0.005), (400, 0.01),
                                       (50, 0.1)])
def test_onecycle_matches_torch(total, pct):
    lr, div, fdiv = 2e-4, 25.0, 10000.0
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, div_factor=div, final_div_factor=fdiv / div,
        total_steps=total, pct_start=pct, cycle_momentum=False,
        anneal_strategy="linear")
    tlrs = []
    for _ in range(total):
        tlrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    ours = onecycle_linear(lr, total, pct, div, fdiv)
    jlrs = np.array([float(ours(i)) for i in range(total)])
    # optax evaluates schedules in float32 -> ~1e-5 relative noise
    np.testing.assert_allclose(jlrs, np.array(tlrs), rtol=5e-5)
