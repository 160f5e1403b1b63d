"""ModifiedResNet vision tower (RN50) — functional, NHWC.

Behavioral twin of reference clip/model.py:23-168: 3-conv antialiased stem
(avgpool instead of maxpool), Bottleneck blocks whose strided convs are
replaced by avgpool + stride-1 conv, and a final attention pooling layer.

TPU notes: convolutions run in NHWC/HWIO layouts (XLA:TPU native); the
attention pool is computed as a single-query attention — the reference runs
full self-attention and keeps token 0 (clip/model.py:79-103), which is
mathematically identical but does (HW+1)x the work.

BatchNorm is functional: ``batch_stats`` is a separate pytree; training mode
returns updated stats and optionally reduces batch statistics over the
``data`` mesh axis — the TPU equivalent of SyncBatchNorm
(training/main.py:119-120).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nans_clip_tpu.configs import ResNetConfig
from nans_clip_tpu.models.common import ModelOptions, cast_tree, normal

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def _conv_init(rng, kh, kw, cin, cout):
    # torch Conv2d default: kaiming_uniform_(a=sqrt(5)) -> gain
    # sqrt(2/(1+5)) = 1/sqrt(3), bound = gain*sqrt(3/fan_in) =
    # sqrt(1/fan_in). (An extra sqrt(3) factor here used to give 3x the
    # reference's init variance.)
    bound = math.sqrt(1.0 / (kh * kw * cin))
    return {"kernel": jax.random.uniform(rng, (kh, kw, cin, cout), jnp.float32, -bound, bound)}


def _bn_params(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _bn_stats(c):
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def conv2d(x, kernel, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(x, p, stats, training: bool, axis_name: Optional[str] = None):
    if training:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = mean2 - jnp.square(mean)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            n = n * jax.lax.axis_size(axis_name)
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - BN_MOMENTUM) * stats["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stats["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_stats


def avg_pool(x, window):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, window, window, 1), "VALID"
    ) / (window * window)


# -- Bottleneck --------------------------------------------------------------

EXPANSION = 4


def init_bottleneck(rng, inplanes, planes, stride):
    ks = jax.random.split(rng, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, inplanes, planes), "bn1": _bn_params(planes),
        "conv2": _conv_init(ks[1], 3, 3, planes, planes), "bn2": _bn_params(planes),
        "conv3": _conv_init(ks[2], 1, 1, planes, planes * EXPANSION),
        "bn3": {"scale": jnp.zeros((planes * EXPANSION,)), "bias": jnp.zeros((planes * EXPANSION,))},
    }
    s = {"bn1": _bn_stats(planes), "bn2": _bn_stats(planes), "bn3": _bn_stats(planes * EXPANSION)}
    if stride > 1 or inplanes != planes * EXPANSION:
        p["downsample"] = {"conv": _conv_init(ks[3], 1, 1, inplanes, planes * EXPANSION),
                           "bn": _bn_params(planes * EXPANSION)}
        s["downsample_bn"] = _bn_stats(planes * EXPANSION)
    return p, s


def bottleneck(x, p, s, stride, training, axis_name):
    ns = {}
    out, ns["bn1"] = batch_norm(conv2d(x, p["conv1"]["kernel"]), p["bn1"], s["bn1"], training, axis_name)
    out = jax.nn.relu(out)
    out, ns["bn2"] = batch_norm(conv2d(out, p["conv2"]["kernel"]), p["bn2"], s["bn2"], training, axis_name)
    out = jax.nn.relu(out)
    if stride > 1:
        out = avg_pool(out, stride)
    out, ns["bn3"] = batch_norm(conv2d(out, p["conv3"]["kernel"]), p["bn3"], s["bn3"], training, axis_name)
    if "downsample" in p:
        idn = avg_pool(x, stride) if stride > 1 else x
        idn = conv2d(idn, p["downsample"]["conv"]["kernel"])
        idn, ns["downsample_bn"] = batch_norm(idn, p["downsample"]["bn"], s["downsample_bn"], training, axis_name)
    else:
        idn = x
    return jax.nn.relu(out + idn), ns


# -- Full network -------------------------------------------------------------

def init_resnet(rng: jax.Array, cfg: ResNetConfig) -> Tuple[dict, dict]:
    w = cfg.width
    keys = jax.random.split(rng, 12)
    params = {
        "conv1": _conv_init(keys[0], 3, 3, 3, w // 2), "bn1": _bn_params(w // 2),
        "conv2": _conv_init(keys[1], 3, 3, w // 2, w // 2), "bn2": _bn_params(w // 2),
        "conv3": _conv_init(keys[2], 3, 3, w // 2, w), "bn3": _bn_params(w),
    }
    stats = {"bn1": _bn_stats(w // 2), "bn2": _bn_stats(w // 2), "bn3": _bn_stats(w)}

    inplanes = w
    for stage, (blocks, planes, stride) in enumerate(
            zip(cfg.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2)), start=1):
        bp, bs = [], []
        for i in range(blocks):
            p, s = init_bottleneck(jax.random.fold_in(keys[3], stage * 100 + i),
                                   inplanes, planes, stride if i == 0 else 1)
            inplanes = planes * EXPANSION
            bp.append(p)
            bs.append(s)
        params[f"layer{stage}"] = bp
        stats[f"layer{stage}"] = bs

    c = cfg.feature_dim
    spacial = cfg.image_resolution // 32
    std = c ** -0.5
    params["attnpool"] = {
        "positional_embedding": normal(keys[4], (spacial * spacial + 1, c), std),
        "q": {"kernel": normal(keys[5], (c, c), std), "bias": jnp.zeros((c,))},
        "k": {"kernel": normal(keys[6], (c, c), std), "bias": jnp.zeros((c,))},
        "v": {"kernel": normal(keys[7], (c, c), std), "bias": jnp.zeros((c,))},
        "c": {"kernel": normal(keys[8], (c, cfg.embed_dim), std), "bias": jnp.zeros((cfg.embed_dim,))},
    }
    return params, stats


def attention_pool(x: jax.Array, p: dict, num_heads: int) -> jax.Array:
    """Single-query attention pooling. x: [B, h, w, C] -> [B, embed_dim]."""
    b, hh, ww, c = x.shape
    tokens = x.reshape(b, hh * ww, c)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1) + p["positional_embedding"].astype(x.dtype)

    q = (tokens[:, :1] @ p["q"]["kernel"] + p["q"]["bias"])
    k = tokens @ p["k"]["kernel"] + p["k"]["bias"]
    v = tokens @ p["v"]["kernel"] + p["v"]["bias"]

    dh = c // num_heads
    q = q.reshape(b, 1, num_heads, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, num_heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(dh)
    out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1).astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, c)
    return out @ p["c"]["kernel"] + p["c"]["bias"]


def resnet_features(params: dict, stats: dict, images: jax.Array, cfg: ResNetConfig,
                    options: ModelOptions = ModelOptions(),
                    training: bool = False,
                    axis_name: Optional[str] = None) -> Tuple[jax.Array, dict]:
    """images: [B, R, R, 3] NHWC. Returns ([B, embed_dim], new_batch_stats)."""
    params = cast_tree(params, options)
    x = options.cast(images)
    ns = {}
    for i, stride in ((1, 2), (2, 1), (3, 1)):
        x = conv2d(x, params[f"conv{i}"]["kernel"], stride=stride)
        x, ns[f"bn{i}"] = batch_norm(x, params[f"bn{i}"], stats[f"bn{i}"], training, axis_name)
        x = jax.nn.relu(x)
    x = avg_pool(x, 2)

    for stage in range(1, 5):
        bp_list, bs_list = params[f"layer{stage}"], stats[f"layer{stage}"]
        new_list = []
        for i, (bp, bs) in enumerate(zip(bp_list, bs_list)):
            stride = (1, 2, 2, 2)[stage - 1] if i == 0 else 1
            x, nbs = bottleneck(x, bp, bs, stride, training, axis_name)
            new_list.append(nbs)
        ns[f"layer{stage}"] = new_list

    feats = attention_pool(x, params["attnpool"], cfg.heads)
    return feats, ns
