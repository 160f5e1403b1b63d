"""HuggingFace ``ChineseCLIPModel`` checkpoint <-> this framework.

The reference publishes its weights in two formats: its own ``.pt``
state_dicts (handled by ``utils/torch_interop.py``) and the
``transformers`` port (``OFA-Sys/chinese-clip-*`` repos on the Hub,
``ChineseCLIPModel`` — modeling_chinese_clip.py upstream). A user coming
from the HF ecosystem holds the latter; this module maps it onto the same
pytrees, in both directions, by translating HF key names into the
reference's state_dict layout and reusing the torch-interop machinery
(transposes, fused-QKV stacking, pos-embed resize all live there).

Semantics notes, checked against the HF implementation:
* ``ChineseCLIPVisionModel`` is the CLIP pre-LN ViT — class+patch+pos
  embeddings, ``pre_layrnorm`` (sic), quick-GELU MLP (``hidden_act``
  default), ``post_layernorm`` applied to the CLS row, bias-free
  ``visual_projection`` — identical math to the reference's
  ``VisualTransformer`` (clip/model.py:230-287) and our ``models/vit.py``.
* ``ChineseCLIPTextModel`` is the same Chinese-BERT as the reference's
  ``modeling_bert.py``; ``get_text_features`` takes the CLS row through
  the bias-free ``text_projection``, exactly like clip/model.py:396-400.
* HF stores projections as ``nn.Linear`` weights ``[embed_dim, width]``;
  the reference (and we) store the matrices ``[width, embed_dim]``.

There is no HF ResNet variant (the Hub ports are all ViT), so only ViT
towers are handled.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

from nans_clip_tpu.configs import CLIPConfig, TextConfig, VisionConfig

# Buffers / heads that carry no weights we use.
_DROP = re.compile(
    r"(\.position_ids$|^text_model\.pooler\.|\.num_batches_tracked$)")

# Straight renames (vision side + projections). Attention q/k/v is fused
# separately below.
_VISION_RULES = [
    (re.compile(r"^vision_model\.embeddings\.class_embedding$"),
     "visual.class_embedding"),
    (re.compile(r"^vision_model\.embeddings\.patch_embedding\.weight$"),
     "visual.conv1.weight"),
    (re.compile(r"^vision_model\.embeddings\.position_embedding\.weight$"),
     "visual.positional_embedding"),
    (re.compile(r"^vision_model\.pre_layrnorm\.(weight|bias)$"),
     r"visual.ln_pre.\1"),
    (re.compile(r"^vision_model\.post_layernorm\.(weight|bias)$"),
     r"visual.ln_post.\1"),
    (re.compile(r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.(weight|bias)$"),
     r"visual.transformer.resblocks.\1.ln_1.\2"),
    (re.compile(r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.(weight|bias)$"),
     r"visual.transformer.resblocks.\1.ln_2.\2"),
    (re.compile(r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.(weight|bias)$"),
     r"visual.transformer.resblocks.\1.attn.out_proj.\2"),
    (re.compile(r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.(weight|bias)$"),
     r"visual.transformer.resblocks.\1.mlp.c_fc.\2"),
    (re.compile(r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.(weight|bias)$"),
     r"visual.transformer.resblocks.\1.mlp.c_proj.\2"),
]

_QKV = re.compile(
    r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)$")


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, dtype=np.float32)


def is_hf_layout(sd: dict) -> bool:
    """True when the checkpoint is (predominantly) HF ``ChineseCLIPModel``
    layout. Majority vote, not ``any()``: a mixed / partially-corrupt dict
    with a single stray ``vision_model.*`` key must not flip the whole
    translation and then fail with an error naming the wrong format."""
    if not sd:
        return False
    hf = sum(k.startswith(("vision_model.", "text_model."))
             or k in ("visual_projection.weight", "text_projection.weight")
             for k in sd)
    ref = sum(k.startswith(("visual.", "bert.", "module.")) for k in sd)
    return hf > max(ref, len(sd) // 2)


def hf_to_reference_state_dict(sd: dict) -> Dict[str, np.ndarray]:
    """HF ``ChineseCLIPModel.state_dict()`` -> reference CN-CLIP layout
    (``visual.* / bert.* / text_projection / logit_scale``), fp32 numpy.

    Raises KeyError on unmapped weight keys so a mismatched checkpoint
    fails loudly instead of silently dropping tensors.
    """
    out: Dict[str, np.ndarray] = {}
    qkv: Dict[Tuple[int, str], Dict[str, np.ndarray]] = {}
    unmapped = []
    for k, v in sd.items():
        if _DROP.search(k):
            continue
        m = _QKV.match(k)
        if m:
            layer, which, kind = int(m.group(1)), m.group(2), m.group(3)
            qkv.setdefault((layer, kind), {})[which] = _to_np(v)
            continue
        if k.startswith("text_model."):
            out["bert." + k[len("text_model."):]] = _to_np(v)
            continue
        if k == "visual_projection.weight":
            out["visual.proj"] = _to_np(v).T
            continue
        if k == "text_projection.weight":
            out["text_projection"] = _to_np(v).T
            continue
        if k == "logit_scale":
            out["logit_scale"] = _to_np(v)
            continue
        for pat, repl in _VISION_RULES:
            if pat.match(k):
                out[pat.sub(repl, k)] = _to_np(v)
                break
        else:
            unmapped.append(k)
    if unmapped:
        raise KeyError(f"unmapped HF checkpoint keys: {sorted(unmapped)}")

    # fuse per-layer q/k/v into the torch-MHA in_proj layout the
    # torch-interop converter consumes (order q,k,v along dim 0)
    for (layer, kind), parts in qkv.items():
        if set(parts) != {"q", "k", "v"}:
            raise KeyError(f"incomplete q/k/v set for vision layer {layer}: "
                           f"{sorted(parts)} ({kind})")
        name = "in_proj_weight" if kind == "weight" else "in_proj_bias"
        out[f"visual.transformer.resblocks.{layer}.attn.{name}"] = (
            np.concatenate([parts["q"], parts["k"], parts["v"]], axis=0))
    return out


def reference_to_hf_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference CN-CLIP layout -> HF ``ChineseCLIPModel`` key names.

    Input is the (non-flash) layout that ``state_dict_from_params``
    emits; ViT towers only (HF has no ResNet port).
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = _to_np(v)
        if k.startswith("bert."):
            out["text_model." + k[len("bert."):]] = v
        elif k == "visual.proj":
            out["visual_projection.weight"] = v.T
        elif k == "text_projection":
            out["text_projection.weight"] = v.T
        elif k == "logit_scale":
            out["logit_scale"] = v
        elif k == "visual.class_embedding":
            out["vision_model.embeddings.class_embedding"] = v
        elif k == "visual.conv1.weight":
            out["vision_model.embeddings.patch_embedding.weight"] = v
        elif k == "visual.positional_embedding":
            out["vision_model.embeddings.position_embedding.weight"] = v
        elif k.startswith("visual.ln_pre."):
            out["vision_model.pre_layrnorm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("visual.ln_post."):
            out["vision_model.post_layernorm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("visual.transformer.resblocks."):
            rest = k[len("visual.transformer.resblocks."):]
            layer, sub = rest.split(".", 1)
            base = f"vision_model.encoder.layers.{layer}"
            if sub in ("attn.in_proj_weight", "attn.in_proj_bias"):
                kind = "weight" if sub.endswith("weight") else "bias"
                for name, part in zip(("q", "k", "v"), np.split(v, 3, axis=0)):
                    out[f"{base}.self_attn.{name}_proj.{kind}"] = part
            else:
                sub = (sub.replace("ln_1.", "layer_norm1.")
                       .replace("ln_2.", "layer_norm2.")
                       .replace("attn.out_proj.", "self_attn.out_proj.")
                       .replace("mlp.c_fc.", "mlp.fc1.")
                       .replace("mlp.c_proj.", "mlp.fc2."))
                out[f"{base}.{sub}"] = v
        else:
            raise KeyError(f"cannot map reference key to HF layout: {k}")
    return out


def config_from_hf(hf_config: dict) -> CLIPConfig:
    """Build a CLIPConfig from a ``ChineseCLIPConfig`` dict (config.json).

    Rejects configs our towers cannot represent (non-quick-GELU vision
    activation, MLP ratio != 4) rather than loading them silently wrong.
    """
    v, t = hf_config["vision_config"], hf_config["text_config"]
    act = v.get("hidden_act", "quick_gelu")
    if act != "quick_gelu":
        raise ValueError(f"vision hidden_act={act!r}: the CLIP ViT uses "
                         "quick_gelu (reference clip/model.py:171-178)")
    if v.get("intermediate_size", 4 * v["hidden_size"]) != 4 * v["hidden_size"]:
        raise ValueError("vision MLP ratio != 4 is not a CLIP ViT")
    embed_dim = hf_config.get("projection_dim", v.get("projection_dim", 512))
    vision = VisionConfig(
        embed_dim=embed_dim,
        image_resolution=v["image_size"],
        layers=v["num_hidden_layers"],
        width=v["hidden_size"],
        patch_size=v["patch_size"],
        head_width=v["hidden_size"] // v["num_attention_heads"],
    )
    text = TextConfig(
        vocab_size=t["vocab_size"],
        hidden_size=t["hidden_size"],
        num_hidden_layers=t["num_hidden_layers"],
        num_attention_heads=t["num_attention_heads"],
        intermediate_size=t["intermediate_size"],
        hidden_act=t.get("hidden_act", "gelu"),
        hidden_dropout_prob=t.get("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=t.get("attention_probs_dropout_prob", 0.1),
        max_position_embeddings=t.get("max_position_embeddings", 512),
        type_vocab_size=t.get("type_vocab_size", 2),
        initializer_range=t.get("initializer_range", 0.02),
        layer_norm_eps=t.get("layer_norm_eps", 1e-12),
    )
    return CLIPConfig(embed_dim=embed_dim, vision=vision, text=text,
                      name=hf_config.get("_name_or_path", "hf"))


def load_hf_checkpoint(path: str, cfg: Optional[CLIPConfig] = None
                       ) -> Tuple[dict, CLIPConfig]:
    """Load an HF ``ChineseCLIPModel`` checkpoint directory (or a single
    weights file) into (params, cfg).

    A directory is read like ``from_pretrained``: ``config.json`` for the
    architecture (unless ``cfg`` is given), ``model.safetensors`` else
    ``pytorch_model.bin`` for the weights.
    """
    from nans_clip_tpu.utils.torch_interop import params_from_state_dict

    weights_file = path
    if os.path.isdir(path):
        if cfg is None:
            with open(os.path.join(path, "config.json")) as f:
                cfg = config_from_hf(json.load(f))
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                weights_file = cand
                break
        else:
            raise FileNotFoundError(f"no weights file under {path}")
    if cfg is None:
        raise ValueError("cfg is required when loading a bare weights file")

    if weights_file.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
            sd = load_file(weights_file)
        except (ImportError, TypeError, ValueError):
            # numpy cannot represent bf16 tensors; go through torch
            from safetensors.torch import load_file as load_torch
            sd = load_torch(weights_file)
    else:
        import torch
        sd = torch.load(weights_file, map_location="cpu", weights_only=True)
    params, _ = params_from_state_dict(hf_to_reference_state_dict(sd), cfg)
    return params, cfg


def config_to_hf(cfg: CLIPConfig) -> dict:
    """CLIPConfig -> ``ChineseCLIPConfig``-shaped dict (config.json)."""
    if cfg.is_resnet:
        raise ValueError("HF ChineseCLIP has no ResNet vision tower")
    v, t = cfg.vision, cfg.text
    return {
        "model_type": "chinese_clip",
        "projection_dim": cfg.embed_dim,
        "logit_scale_init_value": 2.6592,
        "vision_config": {
            "model_type": "chinese_clip_vision_model",
            "hidden_size": v.width,
            "intermediate_size": 4 * v.width,
            "num_hidden_layers": v.layers,
            "num_attention_heads": v.heads,
            "image_size": v.image_resolution,
            "patch_size": v.patch_size,
            "hidden_act": "quick_gelu",
            "projection_dim": cfg.embed_dim,
        },
        "text_config": {
            "model_type": "chinese_clip_text_model",
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "intermediate_size": t.intermediate_size,
            "hidden_act": t.hidden_act,
            "hidden_dropout_prob": t.hidden_dropout_prob,
            "attention_probs_dropout_prob": t.attention_probs_dropout_prob,
            "max_position_embeddings": t.max_position_embeddings,
            "type_vocab_size": t.type_vocab_size,
            "initializer_range": t.initializer_range,
            "layer_norm_eps": t.layer_norm_eps,
        },
    }


def save_hf_checkpoint(path: str, params: dict, cfg: CLIPConfig,
                       vocab_file: Optional[str] = None,
                       context_length: int = 52) -> None:
    """Write a ``from_pretrained``-loadable directory: ``config.json`` +
    ``model.safetensors`` in ``ChineseCLIPModel`` layout — the export
    direction for publishing our checkpoints into the HF ecosystem.

    When the tower's vocab matches a vocab file (the bundled Chinese-BERT
    vocab by default), the processor side is written too (``vocab.txt``,
    ``tokenizer_config.json``, ``preprocessor_config.json``) so
    ``ChineseCLIPProcessor.from_pretrained`` works on the directory; the
    image settings reproduce the reference transform exactly (square
    bicubic resize, OpenAI mean/std — verified bit-identical to ours)."""
    from nans_clip_tpu.tokenizer import DEFAULT_VOCAB
    from nans_clip_tpu.utils.torch_interop import state_dict_from_params
    from nans_clip_tpu.utils.transform import OPENAI_MEAN, OPENAI_STD

    hf_config = config_to_hf(cfg)   # raises on ResNet before any file IO
    sd = reference_to_hf_state_dict(
        state_dict_from_params(params, cfg))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=2)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(path, "model.safetensors"),
              metadata={"format": "pt"})

    explicit_vocab = vocab_file is not None
    vocab_file = vocab_file or DEFAULT_VOCAB
    with open(vocab_file, encoding="utf-8") as f:
        vocab = f.read()
    # Line count robust to a missing trailing newline. NOT splitlines():
    # the vocab contains a literal U+2028 entry that splitlines() would
    # split, miscounting by one.
    n_lines = len(vocab.split("\n")) - (1 if vocab.endswith("\n") else 0)
    if n_lines != cfg.text.vocab_size:
        msg = (f"vocab file {vocab_file} has {n_lines} entries but the model "
               f"was built with vocab_size={cfg.text.vocab_size}")
        if explicit_vocab:
            raise ValueError(msg)
        import warnings
        warnings.warn(msg + " — exporting the model only (no vocab.txt/"
                      "tokenizer_config/preprocessor_config; the dir will "
                      "not be ChineseCLIPProcessor-loadable)", stacklevel=2)
        return
    with open(os.path.join(path, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write(vocab)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "BertTokenizer", "do_lower_case": True,
                   "model_max_length": context_length}, f, indent=2)
    r = cfg.vision.image_resolution
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({"image_processor_type": "ChineseCLIPImageProcessor",
                   "do_resize": True, "size": {"height": r, "width": r},
                   "resample": 3, "do_center_crop": False,
                   "do_rescale": True, "rescale_factor": 1 / 255,
                   "do_normalize": True, "image_mean": list(OPENAI_MEAN),
                   "image_std": list(OPENAI_STD),
                   "do_convert_rgb": True}, f, indent=2)
