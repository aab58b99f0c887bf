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


def test_size_matrix_matches_reference_experiments():
    """Size presets mirror config/experiment/gen1/{tiny,small,base}.yaml:
    tiny/small use FPN depth 0.33, small shrinks dim_head to 24 (stage-1
    dim 48 is not divisible by the default 32), base keeps 0.67/32."""
    for ds in ("gen1", "gen4"):
        tiny = experiment_preset(ds, "tiny").model
        small = experiment_preset(ds, "small").model
        base = experiment_preset(ds, "base").model
        assert (tiny.fpn.depth, small.fpn.depth, base.fpn.depth) \
            == (0.33, 0.33, 0.67)
        assert (tiny.backbone.dim_head, small.backbone.dim_head,
                base.backbone.dim_head) == (32, 24, 32)
        # every stage dim must split evenly into heads
        for m in (tiny, small, base):
            for d in m.backbone.stage_dims:
                assert d % m.backbone.dim_head == 0


def test_experiment_defaults_match_reference():
    """config/experiment/{gen1,gen4}/default.yaml override general.yaml:
    OneCycle div_factor 25 -> 20; gen4 batch 12 (BASELINE.md)."""
    g1 = experiment_preset("gen1", "base").training
    g4 = experiment_preset("gen4", "base").training
    assert g1.lr_scheduler.div_factor == 20.0
    assert g4.lr_scheduler.div_factor == 20.0
    assert (g1.batch_size_train, g1.batch_size_eval) == (8, 8)
    assert (g4.batch_size_train, g4.batch_size_eval) == (12, 12)
    assert g1.learning_rate == 2e-4 and g4.learning_rate == 3.46e-4
