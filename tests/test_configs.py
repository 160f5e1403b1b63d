"""Config registry tests: the 5 published models resolve with the right
tower dimensions (reference clip/utils.py:27-48 + model_configs/*.json)."""

import pytest

from nans_clip_tpu.configs import (CLIPConfig, ResNetConfig, VisionConfig,
                                   available_models, config_for_name,
                                   load_config, with_resolution)


def test_available_models():
    assert available_models() == ["ViT-B-16", "ViT-L-14", "ViT-L-14-336",
                                  "ViT-H-14", "RN50"]


def test_vit_b16():
    cfg, res = config_for_name("ViT-B-16")
    assert res == 224
    assert cfg.embed_dim == 512
    v = cfg.vision
    assert (v.layers, v.width, v.patch_size, v.heads) == (12, 768, 16, 12)
    assert v.seq_len == 197
    t = cfg.text
    assert (t.num_hidden_layers, t.hidden_size, t.intermediate_size) == (12, 768, 3072)


def test_vit_h14_head_width():
    cfg, _ = config_for_name("ViT-H-14")
    v = cfg.vision
    assert (v.layers, v.width, v.head_width, v.heads) == (32, 1280, 80, 16)
    assert cfg.text.hidden_size == 1024  # RoBERTa-large
    assert cfg.text.num_hidden_layers == 24


def test_vit_l14_336():
    cfg, res = config_for_name("ViT-L-14-336")
    assert res == 336
    assert cfg.vision.image_resolution == 336
    assert cfg.vision.seq_len == 24 * 24 + 1  # 577


def test_rn50():
    cfg, _ = config_for_name("RN50")
    assert cfg.is_resnet
    v = cfg.vision
    assert isinstance(v, ResNetConfig)
    assert v.layers == (3, 4, 6, 3)
    assert v.feature_dim == 2048
    assert v.heads == 32
    assert cfg.text.num_hidden_layers == 3  # RBT3


def test_vit_b32_config_exists():
    cfg = load_config("ViT-B-32@RoBERTa-wwm-ext-base-chinese")
    assert cfg.vision.patch_size == 32
    assert cfg.vision.seq_len == 50


def test_with_resolution():
    cfg = load_config("ViT-B-16@RoBERTa-wwm-ext-base-chinese")
    cfg2 = with_resolution(cfg, 336)
    assert cfg2.vision.image_resolution == 336
    assert cfg2.vision.seq_len == 21 * 21 + 1
    assert with_resolution(cfg, 224) is cfg


def test_unknown_name():
    with pytest.raises(KeyError):
        config_for_name("ViT-Z-99")
    with pytest.raises(FileNotFoundError):
        load_config("NoSuch@RoBERTa-wwm-ext-base-chinese")