"""Dual-tower CLIP container (functional).

Behavioral twin of reference ``CLIP`` (clip/model.py:290-431): routes
``encode_image`` to the ViT or ModifiedResNet tower, ``encode_text`` builds
a padding mask from the [PAD] id, runs BERT and projects the [CLS] state
through ``text_projection``; ``forward`` returns L2-normalized features and
``exp(logit_scale)``; ``get_similarity`` returns both-way scaled logits.
``logit_scale`` initializes to ``ln(1/0.07)`` (clip/model.py:356).

Parameters live in one pytree::

    {"visual": <tower>, "bert": <bert>, "text_projection": [H, E],
     "logit_scale": scalar}

ResNet batch statistics are a separate ``batch_stats`` pytree (empty for
ViT), threaded explicitly in training.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nans_clip_tpu.configs import CLIPConfig, ResNetConfig
from nans_clip_tpu.models.bert import bert_features, init_bert
from nans_clip_tpu.models.common import ModelOptions, normal
from nans_clip_tpu.models.resnet import init_resnet, resnet_features
from nans_clip_tpu.models.vit import init_vit, vit_features

PAD_ID = 0  # vocab.txt line 1 is [PAD]


def init_clip(rng: jax.Array, cfg: CLIPConfig) -> Tuple[dict, dict]:
    """Returns (params, batch_stats). batch_stats is {} for ViT towers."""
    kv, kt, kp = jax.random.split(rng, 3)
    batch_stats: dict = {}
    if cfg.is_resnet:
        visual, batch_stats = init_resnet(kv, cfg.vision)
    else:
        visual = init_vit(kv, cfg.vision)
    params = {
        "visual": visual,
        "bert": init_bert(kt, cfg.text),
        "text_projection": normal(kp, (cfg.text.hidden_size, cfg.embed_dim),
                                  cfg.text.hidden_size ** -0.5),
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }
    return params, batch_stats


def encode_image(params: dict, cfg: CLIPConfig, images: jax.Array,
                 options: ModelOptions = ModelOptions(),
                 mask_ratio: float = 0.0, rng: Optional[jax.Array] = None,
                 batch_stats: Optional[dict] = None,
                 training: bool = False,
                 axis_name: Optional[str] = None):
    """Unnormalized image features [B, E]. For a ResNet tower in training
    mode, returns (features, new_batch_stats)."""
    if cfg.is_resnet:
        assert batch_stats is not None, "ResNet tower needs batch_stats"
        feats, new_stats = resnet_features(params["visual"], batch_stats, images,
                                           cfg.vision, options, training, axis_name)
        return (feats, new_stats) if training else feats
    return vit_features(params["visual"], images, cfg.vision, options,
                        mask_ratio=mask_ratio, rng=rng)


def encode_text(params: dict, cfg: CLIPConfig, text_ids: jax.Array,
                options: ModelOptions = ModelOptions(),
                rng: Optional[jax.Array] = None) -> jax.Array:
    """Unnormalized text features [B, E]; pad mask derived from PAD_ID
    (reference clip/model.py:396-400)."""
    attn_mask = (text_ids != PAD_ID).astype(jnp.float32)
    seq = bert_features(params["bert"], text_ids, attn_mask, cfg.text, options, rng=rng)
    return seq[:, 0, :] @ params["text_projection"].astype(seq.dtype)


def normalize(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)


def forward(params: dict, cfg: CLIPConfig,
            images: Optional[jax.Array], texts: Optional[jax.Array],
            options: ModelOptions = ModelOptions(),
            mask_ratio: float = 0.0, rng: Optional[jax.Array] = None,
            batch_stats: Optional[dict] = None):
    """Reference CLIP.forward semantics (clip/model.py:402-415)."""
    assert images is not None or texts is not None
    img_rng = txt_rng = None
    if rng is not None:
        img_rng, txt_rng = jax.random.split(rng)
    if images is None:
        return encode_text(params, cfg, texts, options, rng=txt_rng)
    if texts is None:
        return encode_image(params, cfg, images, options, mask_ratio, img_rng, batch_stats)
    image_features = encode_image(params, cfg, images, options, mask_ratio, img_rng, batch_stats)
    text_features = encode_text(params, cfg, texts, options, rng=txt_rng)
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    return normalize(image_features), normalize(text_features), scale


def get_similarity(params: dict, cfg: CLIPConfig, images: jax.Array,
                   texts: jax.Array, options: ModelOptions = ModelOptions(),
                   batch_stats: Optional[dict] = None):
    """Both-way scaled cosine logits (reference clip/model.py:417-431)."""
    img = normalize(encode_image(params, cfg, images, options, batch_stats=batch_stats))
    txt = normalize(encode_text(params, cfg, texts, options))
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    logits_per_image = scale * img.astype(jnp.float32) @ txt.astype(jnp.float32).T
    return logits_per_image, logits_per_image.T
