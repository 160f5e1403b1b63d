"""Public API: the reference's ``cn_clip.clip`` surface, TPU-native.

``load_from_name`` / ``load`` / ``tokenize`` / ``image_transform`` /
``available_models`` mirror reference clip/utils.py:14-216; model methods
``encode_image`` / ``encode_text`` / ``get_similarity`` mirror
clip/model.py:390-431, exposed on a thin :class:`CLIPModel` wrapper that
jits per input shape.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu import configs
from nans_clip_tpu.configs import (CLIPConfig, MODEL_CKPT_FILES, MODEL_INFO,
                                   available_models, config_for_name,
                                   load_config, with_resolution)
from nans_clip_tpu.models import ModelOptions, clip as clip_model
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.tokenizer import get_tokenizer, tokenize
from nans_clip_tpu.utils.torch_interop import (load_torch_state_dict,
                                               merge_pretrained,
                                               params_from_state_dict)
from nans_clip_tpu.utils.transform import image_transform, preprocess_batch

__all__ = ["load_from_name", "load", "tokenize", "image_transform",
           "available_models", "CLIPModel", "create_model"]


class CLIPModel:
    """Bundles (config, params, batch_stats, options) with jitted methods."""

    def __init__(self, cfg: CLIPConfig, params: dict, batch_stats: Optional[dict] = None,
                 options: ModelOptions = ModelOptions()):
        self.cfg = cfg
        self.params = params
        self.batch_stats = batch_stats or {}
        self.options = options

        def _img(params, batch_stats, images):
            return clip_model.encode_image(params, cfg, images, options,
                                           batch_stats=batch_stats if cfg.is_resnet else None)

        def _txt(params, texts):
            return clip_model.encode_text(params, cfg, texts, options)

        self._encode_image = jax.jit(_img)
        self._encode_text = jax.jit(_txt)

    @property
    def image_resolution(self) -> int:
        return self.cfg.vision.image_resolution

    def quantize(self, mode: str = "int8",
                 towers=("text", "image")) -> "CLIPModel":
        """Weight-only int8 serving copy (utils/quantize.py): the
        whole-tower kernel then streams half the weight bytes per call —
        the batch-1 latency bottleneck; shapes outside the tower route
        dequantize on entry. Returns a NEW model; ``self`` is unchanged.
        Text towers win decisively (1.21-1.45x batch-1); wide image
        towers measured neutral-to-slower — pass ``towers=("text",)``
        for ViT-H-class deployments (see quantize_for_serving). TPU
        analog of the reference's quantized TensorRT engine option
        (cn_clip/deploy/onnx_to_tensorrt.py precision flags)."""
        if mode != "int8":
            raise ValueError(f"unsupported quantize mode: {mode!r}")
        from nans_clip_tpu.utils.quantize import quantize_for_serving
        return CLIPModel(self.cfg,
                         quantize_for_serving(self.params, towers),
                         self.batch_stats, self.options)

    def encode_image(self, images) -> jax.Array:
        """images: [B, R, R, 3] NHWC float. Unnormalized features [B, E]."""
        return self._encode_image(self.params, self.batch_stats, jnp.asarray(images))

    def encode_text(self, texts) -> jax.Array:
        """texts: [B, context_length] int ids. Unnormalized features [B, E]."""
        return self._encode_text(self.params, jnp.asarray(texts))

    def get_similarity(self, images, texts) -> Tuple[jax.Array, jax.Array]:
        img = self.encode_image(images)
        txt = self.encode_text(texts)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.params["logit_scale"])
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T

    def forward(self, images, texts, mask_ratio: float = 0.0, rng=None):
        return clip_model.forward(self.params, self.cfg, jnp.asarray(images),
                                  jnp.asarray(texts), self.options,
                                  mask_ratio=mask_ratio, rng=rng,
                                  batch_stats=self.batch_stats if self.cfg.is_resnet else None)


def _resolve_checkpoint(name: str, download_root: Optional[str], use_modelscope: bool = False) -> str:
    root = download_root or os.path.expanduser("~/.cache/clip")
    reponame, filename = MODEL_CKPT_FILES[name]
    target = os.path.join(root, filename)
    if os.path.isfile(target):
        return target
    os.makedirs(root, exist_ok=True)
    try:
        if use_modelscope:
            from modelscope.hub.file_download import model_file_download
            return model_file_download(model_id=f"AI-ModelScope/{reponame}",
                                       file_path=filename, local_dir=root)
        from huggingface_hub import hf_hub_download
        return hf_hub_download(f"OFA-Sys/{reponame}", filename=filename, local_dir=root)
    except Exception as e:  # no egress / hub missing
        raise RuntimeError(
            f"Checkpoint {filename} not found at {target} and download failed ({e}). "
            f"Download it manually into {root}.") from e


def create_model(model_name: str, checkpoint_path: Optional[str] = None,
                 input_resolution: Optional[int] = None,
                 options: ModelOptions = ModelOptions(),
                 seed: int = 0) -> CLIPModel:
    """Build a model from a ``Vision@Text`` struct (+ optional .pt ckpt)."""
    cfg = load_config(model_name)
    if input_resolution:
        cfg = with_resolution(cfg, input_resolution)
    params, batch_stats = init_clip(jax.random.PRNGKey(seed), cfg)
    if checkpoint_path:
        sd = load_torch_state_dict(checkpoint_path)
        loaded, loaded_stats = params_from_state_dict(sd, cfg)
        params.update(loaded)
        if loaded_stats:
            batch_stats = loaded_stats
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return CLIPModel(cfg, params, batch_stats, options)


def load_from_name(name: str, download_root: Optional[str] = None,
                   vision_model_name: Optional[str] = None,
                   text_model_name: Optional[str] = None,
                   input_resolution: Optional[int] = None,
                   use_modelscope: bool = False,
                   options: ModelOptions = ModelOptions()):
    """Reference clip/utils.py:106-127. Returns (CLIPModel, preprocess_fn)."""
    if name in MODEL_INFO:
        model_path = _resolve_checkpoint(name, download_root, use_modelscope)
        vision, text, resolution = MODEL_INFO[name]
        struct = f"{vision}@{text}"
    elif os.path.isdir(name) and os.path.isfile(os.path.join(name, "config.json")):
        # HF `save_pretrained` snapshot (transformers ChineseCLIPModel):
        # architecture comes from its config.json, weights from
        # safetensors/bin; pos-embed resizes if input_resolution differs.
        import json

        from nans_clip_tpu.utils.hf_interop import (config_from_hf,
                                                    load_hf_checkpoint)
        if vision_model_name or text_model_name:
            raise ValueError(
                "vision_model_name/text_model_name cannot override an HF "
                "snapshot directory — its architecture comes from "
                f"{os.path.join(name, 'config.json')}. Drop them, or pass a "
                "bare .pt file to pick the architecture explicitly.")
        with open(os.path.join(name, "config.json")) as f:
            cfg = config_from_hf(json.load(f))
        if input_resolution:
            cfg = with_resolution(cfg, input_resolution)
        params, cfg = load_hf_checkpoint(name, cfg)
        model = CLIPModel(cfg, jax.tree.map(jnp.asarray, params), {}, options)
        return model, image_transform(cfg.vision.image_resolution)
    elif os.path.isfile(name):
        assert vision_model_name and text_model_name and input_resolution, \
            "Please specify 'vision_model_name', 'text_model_name' and 'input_resolution'"
        model_path = name
        struct = f"{vision_model_name}@{text_model_name}"
        resolution = input_resolution
    else:
        raise RuntimeError(f"Model {name} not found; available models = {available_models()}")
    model = create_model(struct, model_path, input_resolution=resolution, options=options)
    return model, image_transform(resolution)


def load(model: CLIPModel, clip_path: Optional[str] = None, bert_path: Optional[str] = None):
    """Initialize towers from separate CLIP + BERT state dicts
    (reference clip/utils.py:130-142)."""
    clip_sd = load_torch_state_dict(clip_path) if clip_path else None
    bert_sd = load_torch_state_dict(bert_path) if bert_path else None
    params = jax.tree.map(np.asarray, model.params)
    params, batch_stats = merge_pretrained(params, model.batch_stats, model.cfg,
                                           clip_sd, bert_sd)
    model.params = jax.tree.map(jnp.asarray, params)
    model.batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return model
