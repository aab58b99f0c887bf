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

        transforms = types.ModuleType("torchvision.transforms")
        tf_functional = types.ModuleType("torchvision.transforms.functional")

        class InterpolationMode:
            NEAREST = "nearest"
            BILINEAR = "bilinear"

        def rotate(img, angle, interpolation=InterpolationMode.NEAREST,
                   expand=False, center=None, fill=None):
            """torchvision.transforms.functional.rotate tensor semantics
            (no expand, center=None, zero fill): inverse affine matrix for a
            rotation about the image center -> half-pixel-offset affine grid
            -> grid_sample(align_corners=False). Needed so the reference
            augmentor (data/utils/augmentor.py:368) runs as a parity oracle."""
            import math

            import torch

            assert not expand and center is None and fill is None
            mode = (interpolation if isinstance(interpolation, str)
                    else "nearest")
            h, w = img.shape[-2], img.shape[-1]
            rot = math.radians(-angle)
            cos_r, sin_r = math.cos(rot), math.sin(rot)
            theta = torch.tensor(
                [[cos_r, sin_r, 0.0], [-sin_r, cos_r, 0.0]],
                dtype=torch.float32).unsqueeze(0)
            d = 0.5
            x = torch.linspace(-w * 0.5 + d, w * 0.5 + d - 1, steps=w)
            y = torch.linspace(-h * 0.5 + d, h * 0.5 + d - 1, steps=h)
            base = torch.empty(1, h, w, 3, dtype=torch.float32)
            base[..., 0] = x
            base[..., 1] = y.unsqueeze(-1)
            base[..., 2] = 1.0
            rescaled = theta.transpose(1, 2) / torch.tensor(
                [0.5 * w, 0.5 * h], dtype=torch.float32)
            grid = base.view(1, h * w, 3).bmm(rescaled).view(1, h, w, 2)
            orig_dtype = img.dtype
            batched = img.reshape(-1, 1, h, w).to(torch.float32)
            out = torch.nn.functional.grid_sample(
                batched, grid.expand(batched.shape[0], -1, -1, -1),
                mode=mode, padding_mode="zeros", align_corners=False)
            out = out.reshape(img.shape)
            if not orig_dtype.is_floating_point:
                out = out.round()
            return out.to(orig_dtype)

        tf_functional.rotate = rotate
        tf_functional.InterpolationMode = InterpolationMode
        transforms.InterpolationMode = InterpolationMode
        transforms.functional = tf_functional
        tv.transforms = transforms

        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = tf_functional


def _install_heavy_stubs():
    """Stubs for module-level imports of modules/pseudo_labeler.py that
    its EventSeqData class never touches (pytorch_lightning, nerv, and
    the Lightning-based modules.detection.Module)."""
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        plu = types.ModuleType("pytorch_lightning.utilities")
        plt_ = types.ModuleType("pytorch_lightning.utilities.types")
        plt_.STEP_OUTPUT = object
        pl.utilities = plu
        plu.types = plt_
        sys.modules.update({
            "pytorch_lightning": pl,
            "pytorch_lightning.utilities": plu,
            "pytorch_lightning.utilities.types": plt_,
        })
    if "nerv" not in sys.modules:
        nerv = types.ModuleType("nerv")
        nerv_utils = types.ModuleType("nerv.utils")

        class AverageMeter:
            def __init__(self, *a, **k):
                self.avg = 0.0

            def update(self, *a, **k):
                pass

        nerv_utils.AverageMeter = AverageMeter
        nerv.utils = nerv_utils
        sys.modules.update({"nerv": nerv, "nerv.utils": nerv_utils})
    if "pycocotools" not in sys.modules:
        pct = types.ModuleType("pycocotools")
        pct_coco = types.ModuleType("pycocotools.coco")
        pct_eval = types.ModuleType("pycocotools.cocoeval")

        class _Unavailable:                 # pragma: no cover
            def __init__(self, *a, **k):
                raise RuntimeError("pycocotools shim: not available")

        pct_coco.COCO = _Unavailable
        pct_eval.COCOeval = _Unavailable
        pct.coco = pct_coco
        pct.cocoeval = pct_eval
        sys.modules.update({"pycocotools": pct,
                            "pycocotools.coco": pct_coco,
                            "pycocotools.cocoeval": pct_eval})
    # coco_eval.py calls torch.cuda.get_device_name() at module level
    # (crashes on CPU-only torch) and needs pycocotools; EventSeqData
    # never reaches it, so stub the leaf module.
    if "utils.evaluation.prophesee.metrics.coco_eval" not in sys.modules:
        ce = types.ModuleType("utils.evaluation.prophesee.metrics.coco_eval")

        def _no_eval(*a, **k):              # pragma: no cover
            raise RuntimeError("coco_eval shim: not available")

        ce.evaluate_detection = _no_eval
        ce.coco_eval_type = "shim"
        sys.modules["utils.evaluation.prophesee.metrics.coco_eval"] = ce
    if "modules.detection" not in sys.modules:
        det = types.ModuleType("modules.detection")
        det.Module = object
        sys.modules["modules.detection"] = det


def import_reference_pseudo():
    """Returns (EventSeqData, tta_postprocess, ObjectLabels) from the
    reference pseudo-label writer (modules/pseudo_labeler.py:94-407)."""
    _install_shims()
    _install_heavy_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from data.genx_utils.labels import ObjectLabels
    from modules.pseudo_labeler import EventSeqData, tta_postprocess
    return EventSeqData, tta_postprocess, ObjectLabels


def import_reference_augmentor():
    """Returns (RandomSpatialAugmentorGenX, ObjectLabels, DataType) from
    the reference spatial augmentor (data/utils/augmentor.py)."""
    _install_shims()
    _install_heavy_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from data.genx_utils.labels import ObjectLabels
    from data.utils.augmentor import RandomSpatialAugmentorGenX
    from data.utils.types import DataType
    return RandomSpatialAugmentorGenX, ObjectLabels, DataType


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
