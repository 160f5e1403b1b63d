"""On-device image augmentation (jit-fused into the train step).

The reference augments on host CPU workers with timm's
``create_transform(scale=(0.9, 1.0), auto_augment='original',
interpolation='bicubic')`` (training/data.py:72-83). On TPU the host is the
bottleneck, so the augmentation stage runs on device instead, on uint8
batches straight from the decode pool:

* RandomResizedCrop(scale=(0.9, 1.0), ratio=(3/4, 4/3), bicubic) — exact
  semantics via ``jax.image.scale_and_translate`` (continuous crop box, no
  intermediate gather);
* horizontal flip p=0.5 (timm default);
* the FULL AutoAugment 'original' ImageNet policy (data/autoaugment.py),
  every op PIL-golden-tested, including the geometric ops;
* OpenAI-CLIP mean/std normalization.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from nans_clip_tpu.utils.transform import OPENAI_MEAN, OPENAI_STD


def _random_resized_crop(rng, img_f, out_size: int,
                         scale=(0.9, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """img_f: [H, W, 3] float. Returns [out, out, 3]."""
    h, w = img_f.shape[0], img_f.shape[1]
    k_area, k_ratio, k_x, k_y = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(k_ratio, (), minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=1.0) * (w - cw)
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=1.0) * (h - ch)
    # Map crop box -> output window: out = img(scale*x + translate)
    sy = out_size / ch
    sx = out_size / cw
    translation = jnp.stack([-y0 * sy, -x0 * sx])
    return jax.image.scale_and_translate(
        img_f, (out_size, out_size, 3), (0, 1),
        jnp.stack([sy, sx]), translation, method="cubic")


@functools.partial(jax.jit, static_argnames=("out_size", "augment"))
def preprocess_images(rng: jax.Array, raw: jax.Array, out_size: int,
                      augment: bool = False) -> jax.Array:
    """uint8 [N, H, W, 3] -> normalized float32 [N, out, out, 3]."""
    x = raw.astype(jnp.float32)

    if augment:
        from nans_clip_tpu.data.autoaugment import auto_augment

        n = raw.shape[0]
        rngs = jax.random.split(rng, n * 3).reshape(n, 3, 2)

        def one(r, img):
            img = _random_resized_crop(r[0], img, out_size)
            img = jnp.clip(img, 0.0, 255.0)
            flip = jax.random.bernoulli(r[1])
            img = jnp.where(flip, img[:, ::-1, :], img)
            return auto_augment(r[2], img)

        x = jax.vmap(one)(rngs, x)
    elif raw.shape[1] != out_size or raw.shape[2] != out_size:
        x = jax.image.resize(x, (x.shape[0], out_size, out_size, 3), "cubic")

    x = x / 255.0
    mean = jnp.asarray(OPENAI_MEAN, x.dtype)
    std = jnp.asarray(OPENAI_STD, x.dtype)
    return (x - mean) / std
