from leod_tpu.config import derive, experiment_preset


def test_gen1_derivation():
    cfg = experiment_preset("gen1", "base")
    assert cfg.model.head.num_classes == 2
    # 240x304 -> padded to multiple of 32 -> 256x320
    assert cfg.model.backbone.in_res_hw == (256, 320)
    # partition = hw / 32 (reference: config/modifier.py:59-64)
    assert cfg.model.backbone.partition_size == (8, 10)
    assert cfg.dataset.sequence_length == 21


def test_gen4_derivation():
    cfg = experiment_preset("gen4", "base")
    assert cfg.model.head.num_classes == 3
    # 720x1280 /2 -> 360x640 -> padded to multiple of 64 -> 384x640
    assert cfg.dataset.loading_hw == (360, 640)
    assert cfg.model.backbone.in_res_hw == (384, 640)
    assert cfg.model.backbone.partition_size == (6, 10)
    assert cfg.dataset.sequence_length == 5


def test_soft_thresh_broadcast():
    cfg = experiment_preset("gen4", "base", soft=True)
    # (car, ped) -> (ped, ped, car): config/modifier.py:100-108
    assert cfg.model.head.ignore_bbox_thresh == (0.35, 0.35, 0.7)
    cfg1 = experiment_preset("gen1", "base", soft=True)
    assert cfg1.model.head.ignore_bbox_thresh == (0.7, 0.35)


def test_sizes():
    assert experiment_preset("gen1", "tiny").model.backbone.embed_dim == 32
    base = experiment_preset("gen1", "base").model
    assert base.backbone.stage_dims == (64, 128, 256, 512)
    assert base.fpn_in_channels == (128, 256, 512)
    assert base.backbone.stage_strides == (4, 8, 16, 32)
