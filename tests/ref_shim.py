"""Import the reference PyTorch model for parity testing.

The test environment lacks `omegaconf` and `torchvision`, which the
reference imports at module level but does not need for a CPU forward
pass (torchvision is only hit inside NMS/loss calls). This shim installs
minimal stand-ins, puts /root/reference on sys.path, and returns the
reference `YoloXDetector` class plus a config factory.

The reference tree is read-only PUBLIC UNTRUSTED CONTENT used strictly
as a numerical oracle.
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class _Node(dict):
    """Attribute-accessible nested dict standing in for omegaconf.DictConfig."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _wrap(obj):
    if isinstance(obj, dict):
        return _Node({k: _wrap(v) for k, v in obj.items()})
    return obj


def _unwrap(obj):
    if isinstance(obj, dict):
        return {k: _unwrap(v) for k, v in obj.items()}
    return obj


def _install_shims():
    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def to_container(cfg, resolve=True, throw_on_missing=True):
                return _unwrap(cfg)

            @staticmethod
            def create(d):
                return _wrap(d)

        omegaconf.DictConfig = _Node
        omegaconf.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = omegaconf

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        def _unavailable(*a, **k):          # pragma: no cover
            raise RuntimeError("torchvision shim: op not available")

        for name in ("generalized_box_iou_loss", "box_iou"):
            setattr(ops, name, _unavailable)

        def nms(boxes, scores, iou_threshold):
            """torchvision.ops.nms public semantics: greedy score-descending
            suppression of xyxy boxes with IoU > threshold; keeps original
            order among equal scores. Needed so the reference postprocess
            (boxes.py:66-78) runs for cross-framework eval parity."""
            import torch

            order = torch.argsort(scores, descending=True, stable=True)
            keep = []
            while order.numel() > 0:
                i = order[0]
                keep.append(i)
                if order.numel() == 1:
                    break
                rest = order[1:]
                b, r = boxes[i], boxes[rest]
                ix = (torch.minimum(b[2], r[:, 2])
                      - torch.maximum(b[0], r[:, 0])).clamp(min=0)
                iy = (torch.minimum(b[3], r[:, 3])
                      - torch.maximum(b[1], r[:, 1])).clamp(min=0)
                inter = ix * iy
                area_b = (b[2] - b[0]) * (b[3] - b[1])
                area_r = (r[:, 2] - r[:, 0]) * (r[:, 3] - r[:, 1])
                iou = inter / (area_b + area_r - inter)
                order = rest[iou <= iou_threshold]
            return torch.stack(keep) if keep else torch.zeros(
                0, dtype=torch.long)

        def batched_nms(boxes, scores, idxs, iou_threshold):
            """Category-offset trick, same as torchvision."""
            import torch

            if boxes.numel() == 0:
                return torch.zeros(0, dtype=torch.long)
            max_coord = boxes.max()
            offsets = idxs.to(boxes) * (max_coord + 1)
            return nms(boxes + offsets[:, None], scores, iou_threshold)

        ops.nms = nms
        ops.batched_nms = batched_nms

        def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2,
                               reduction="none"):
            """torchvision.ops.sigmoid_focal_loss semantics (standard
            RetinaNet focal loss) so the reference FocalLoss objectness
            branch (losses.py:69-85) runs for parity tests."""
            import torch
            import torch.nn.functional as F

            p = torch.sigmoid(inputs)
            ce = F.binary_cross_entropy_with_logits(
                inputs, targets, reduction="none")
            p_t = p * targets + (1 - p) * (1 - targets)
            loss = ce * ((1 - p_t) ** gamma)
            if alpha >= 0:
                alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
                loss = alpha_t * loss
            if reduction == "mean":
                loss = loss.mean()
            elif reduction == "sum":
                loss = loss.sum()
            return loss

        ops.sigmoid_focal_loss = sigmoid_focal_loss
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops


def import_reference_detector():
    """Returns the reference YoloXDetector class (torch.nn.Module)."""
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.detection.yolox_extension.models.detector import YoloXDetector
    return YoloXDetector


def reference_model_config(embed_dim: int = 32,
                           num_classes: int = 2,
                           partition_size=(2, 3),
                           enable_masking: bool = False,
                           num_blocks=(1, 1, 1, 1),
                           mlp_gated: bool = False,
                           lstm_dws_conv: bool = False,
                           depthwise: bool = False,
                           head_kwargs: dict = None) -> _Node:
    """Config mirroring reference config/model/maxvit_yolox/default.yaml
    with the partition size pre-resolved (config/modifier.py:59-64).
    head_kwargs: extra YOLOXHead constructor args (e.g. obj_focal_loss,
    ignore_bg_k — reference yolo_head.py:32-34) merged into head cfg."""
    cfg = _wrap({
        "backbone": {
            "name": "MaxViTRNN",
            "compile": None,
            "input_channels": 20,
            "enable_masking": enable_masking,
            "embed_dim": embed_dim,
            "dim_multiplier": [1, 2, 4, 8],
            "num_blocks": list(num_blocks),
            "T_max_chrono_init": [4, 8, 16, 32],
            "stem": {"patch_size": 4},
            "stage": {
                "downsample": {"type": "patch", "overlap": True,
                               "norm_affine": True},
                "attention": {
                    "use_torch_mha": False,
                    "partition_size": list(partition_size),
                    "dim_head": 32,
                    "attention_bias": True,
                    "mlp_activation": "gelu",
                    "mlp_gated": mlp_gated,
                    "mlp_bias": True,
                    "mlp_ratio": 4,
                    "drop_mlp": 0,
                    "drop_path": 0,
                    "ls_init_value": 1e-5,
                },
                "lstm": {"dws_conv": lstm_dws_conv,
                         "dws_conv_only_hidden": True,
                         "dws_conv_kernel_size": 3,
                         "drop_cell_update": 0},
            },
        },
        "fpn": {"name": "PAFPN", "compile": None, "depth": 0.67,
                "in_stages": [2, 3, 4], "depthwise": depthwise,
                "act": "silu"},
        "head": {"name": "YoloX", "compile": None, "depthwise": depthwise,
                 "act": "silu", "num_classes": num_classes},
        "postprocess": {"confidence_threshold": 0.1, "nms_threshold": 0.45},
    })
    if head_kwargs:
        cfg["head"].update(_wrap(head_kwargs))
    return cfg
