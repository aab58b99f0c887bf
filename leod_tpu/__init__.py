"""leod_tpu: TPU-native event-camera object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LEOD
(CVPR'24, RVT backbone + YOLOX head + label-efficient self-training),
built TPU-first: NHWC layouts, bf16 matmuls on the MXU, `lax.scan` over
time with explicit ConvLSTM carries, fully-batched static-shape SimOTA,
fixed-shape NMS, and `jax.sharding`-based data parallelism.

Reference behavior surveyed in SURVEY.md (citations point into
/root/reference). This package is an independent implementation.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keep `import leod_tpu` light)."""
    if name == "Detector":
        from .models.detector import Detector
        return Detector
    if name == "Trainer":
        from .train.trainer import Trainer
        return Trainer
    if name == "experiment_preset":
        from .config import experiment_preset
        return experiment_preset
    if name == "run_streaming_eval":
        from .train.trainer import run_streaming_eval
        return run_streaming_eval
    if name == "load_torch_checkpoint":
        from .convert import load_torch_checkpoint
        return load_torch_checkpoint
    raise AttributeError(name)
