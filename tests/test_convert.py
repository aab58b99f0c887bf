"""Full-model numerics parity: reference YoloXDetector (torch CPU) vs our
Detector with weights mapped through leod_tpu.convert.

This is the composition check the per-layer tests can't give (gate
ordering, skip_first_norm placement, FPN concat order, head bias init,
decode): a randomly-initialized reference model's decoded eval outputs
must match ours to ~1e-4 after conversion, over multiple recurrent
timesteps (reference: models/detection/yolox_extension/models/
detector.py:18-91).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from leod_tpu.config import (BackboneConfig, HeadConfig, ModelConfig,
                             dataset_preset, derive, experiment_preset)
from leod_tpu.convert import check_compatible, convert_torch_state_dict
from leod_tpu.models.detector import Detector

from ref_shim import import_reference_detector, reference_model_config

H, W = 64, 96          # multiples of 32; partition (2, 3)


def _randomize(model: torch.nn.Module, seed: int = 0):
    """Perturb every param and BN buffer so conversion of each leaf is
    exercised (zero biases and 0/1 running stats would hide transposes)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0.0, 0.1, generator=g)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 1.5, generator=g)


def _our_config(**bb_kwargs) -> ModelConfig:
    bb = BackboneConfig(embed_dim=32, in_res_hw=(H, W),
                        partition_size=(2, 3), **bb_kwargs)
    return ModelConfig(backbone=bb, head=HeadConfig(num_classes=2))


def _forward_reference(ref, xs):
    ref.eval()
    states = None
    with torch.no_grad():
        for x in xs:
            feats, states = ref.forward_backbone(
                torch.from_numpy(x), previous_states=states)
        out, _ = ref.forward_detect(feats)
    return out.numpy()


def _forward_ours(det: Detector, variables, xs):
    states = det.init_states(xs[0].shape[0], jnp.float32)
    for x in xs:
        feats, states = det.forward_backbone(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), states)
    preds, _ = det.forward_detect(variables, feats, train=False)
    return np.asarray(preds)


@pytest.mark.parametrize("variant", ["plain", "dws_lstm"])
def test_full_model_parity(variant):
    dws = variant == "dws_lstm"
    RefDet = import_reference_detector()
    ref = RefDet(reference_model_config(lstm_dws_conv=dws))
    _randomize(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state_dict(sd)

    det = Detector(_our_config(lstm_dws_conv=dws), dtype=jnp.float32)
    init_vars = jax.device_get(det.init(jax.random.PRNGKey(0)))
    check_compatible(variables, init_vars)

    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(2, 20, H, W)).astype(np.float32) * 3
          for _ in range(3)]
    out_ref = _forward_reference(ref, xs)
    out_ours = _forward_ours(det, variables, xs)
    assert out_ref.shape == out_ours.shape
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-3, atol=1e-4)


def test_lightning_prefix_and_leftover_detection():
    RefDet = import_reference_detector()
    ref = RefDet(reference_model_config())
    sd = {f"mdl.{k}": v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state_dict(sd)      # prefix stripped
    assert "stage1" in variables["params"]["backbone"]

    sd["mdl.some.unknown.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_state_dict(sd)
    convert_torch_state_dict(sd, strict=False)    # tolerated when lax


def test_mask_token_conversion():
    RefDet = import_reference_detector()
    ref = RefDet(reference_model_config(enable_masking=True))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state_dict(sd)
    tok = variables["params"]["backbone"]["stage1"]["mask_token"]
    np.testing.assert_allclose(
        tok, sd["backbone.stages.0.mask_token"], rtol=0, atol=0)
