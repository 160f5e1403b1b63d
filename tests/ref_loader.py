"""Import the reference torch model modules without the full cn_clip package
(its __init__ needs torchvision, absent here). Test-only helper: used to
verify OUR implementation against the reference's behavior — reference code
is never shipped."""

import importlib.util
import sys
import types

REF = "/root/reference/cn_clip/clip"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_clip():
    """Returns the reference's model module (torch CLIP & towers)."""
    if "cn_clip.clip.model" in sys.modules:
        return sys.modules["cn_clip.clip.model"]
    tok = _load("cn_clip_ref_tokenizer", f"{REF}/bert_tokenizer.py")
    pkg = types.ModuleType("cn_clip")
    pkg.__path__ = []
    clip_pkg = types.ModuleType("cn_clip.clip")
    clip_pkg.__path__ = [REF]
    clip_pkg._tokenizer = tok.FullTokenizer()
    sys.modules["cn_clip"] = pkg
    sys.modules["cn_clip.clip"] = clip_pkg
    _load("cn_clip.clip.configuration_bert", f"{REF}/configuration_bert.py")
    _load("cn_clip.clip.modeling_bert", f"{REF}/modeling_bert.py")
    return _load("cn_clip.clip.model", f"{REF}/model.py")


TINY_VIT_KWARGS = dict(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    vocab_size=21128,
    text_attention_probs_dropout_prob=0.1,
    text_hidden_act="gelu",
    text_hidden_dropout_prob=0.1,
    text_hidden_size=64,
    text_initializer_range=0.02,
    text_intermediate_size=256,
    text_max_position_embeddings=512,
    text_num_attention_heads=4,
    text_num_hidden_layers=2,
    text_type_vocab_size=2,
    vision_head_width=32,
)

TINY_RN_KWARGS = dict(TINY_VIT_KWARGS, vision_layers=(1, 1, 1, 1), vision_width=8,
                      vision_patch_size=None, image_resolution=64)


def tiny_config(kwargs):
    """Matching nans_clip_tpu config for the tiny reference kwargs."""
    import json
    import tempfile

    from nans_clip_tpu import configs as C

    layers = kwargs["vision_layers"]
    if isinstance(layers, tuple):
        vision = C.ResNetConfig(embed_dim=kwargs["embed_dim"],
                                image_resolution=kwargs["image_resolution"],
                                layers=layers, width=kwargs["vision_width"],
                                head_width=kwargs.get("vision_head_width", 64))
    else:
        vision = C.VisionConfig(embed_dim=kwargs["embed_dim"],
                                image_resolution=kwargs["image_resolution"],
                                layers=layers, width=kwargs["vision_width"],
                                patch_size=kwargs["vision_patch_size"],
                                head_width=kwargs.get("vision_head_width", 64))
    text = C.TextConfig(
        vocab_size=kwargs["vocab_size"],
        hidden_size=kwargs["text_hidden_size"],
        num_hidden_layers=kwargs["text_num_hidden_layers"],
        num_attention_heads=kwargs["text_num_attention_heads"],
        intermediate_size=kwargs["text_intermediate_size"],
        hidden_act=kwargs["text_hidden_act"],
        hidden_dropout_prob=kwargs["text_hidden_dropout_prob"],
        attention_probs_dropout_prob=kwargs["text_attention_probs_dropout_prob"],
        max_position_embeddings=kwargs["text_max_position_embeddings"],
        type_vocab_size=kwargs["text_type_vocab_size"],
        initializer_range=kwargs["text_initializer_range"],
    )
    return C.CLIPConfig(embed_dim=kwargs["embed_dim"], vision=vision, text=text, name="tiny")
