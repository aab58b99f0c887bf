"""Cross-framework accuracy loop (scaled-down CI version of
tools/e2e_parity.py — see that script and docs/benchmarks.md for the
full 300/1500-step experiment results).

Asserts the two decisive properties on the same synthetic dataset:

  1. EVAL-STACK PARITY: identical (converted) weights through the
     reference model + reference postprocess (torch, transcription of
     Module._val_test_step_impl) and through leod_tpu's
     run_streaming_eval give identical AP metrics.
  2. TRAIN-TRAJECTORY PARITY: training both frameworks from the same
     init on the identical batch stream gives matching early losses
     (the first step exactly; the first 20 steps within a few percent —
     SimOTA's discrete dynamic-k assignment amplifies fp accumulation
     differences over time, so long-horizon parity is assessed by final
     AP in the tools script, not per-step loss).
"""
import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import e2e_parity as ep  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from leod_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("parity"))
    generate_dataset(root, num_train=2, num_val=2, num_test=0,
                     num_reprs=32, label_every=4, first_label_repr=3,
                     hw=(ep.H, ep.W))
    cfg = ep.build_cfg(root)
    ref = ep.make_reference()
    variables = ep.convert_ref(ref)
    return cfg, ref, variables


@pytest.mark.slow
def test_train_trajectory_and_eval_stack_parity(setup):
    import jax
    import jax.numpy as jnp

    from leod_tpu.data.loader import StreamTrainLoader, open_split_sequences
    from leod_tpu.models.detector import Detector

    cfg, ref, variables = setup
    det = Detector(cfg.model, dtype=jnp.float32)

    seqs = open_split_sequences(cfg.dataset, "train")
    it = iter(StreamTrainLoader(seqs, cfg.dataset, ep.B, seed=0))
    batches = [next(it) for _ in range(20)]
    for s in seqs:
        s.close()

    jl, _ = ep.jax_train(det, variables, batches, cfg)
    rl = ep.ref_train(ref, batches, cfg.training.learning_rate)

    # step 1 is identical math on identical weights: near-exact
    assert jl[0] == pytest.approx(rl[0], rel=1e-4)
    rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(rl, jl)]
    assert float(np.mean(rel)) < 0.06, rel

    # eval-stack parity at the (torch-trained) shared weights
    m_ref = ep.ref_streaming_eval(ref, cfg)
    vars_t = jax.device_put(ep.convert_ref(ref))
    m_jax = ep.jax_streaming_eval(det, vars_t, cfg)
    for k in ep.AP_KEYS:
        assert m_jax[k] == pytest.approx(m_ref[k], abs=1e-3), k
