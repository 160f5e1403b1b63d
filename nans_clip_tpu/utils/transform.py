"""Image preprocessing.

Two paths:

* ``image_transform`` — host-side PIL path, numerically matching the
  reference eval/inference transform (clip/utils.py:179-186): bicubic
  square resize -> RGB -> scale to [0,1] -> OpenAI-CLIP normalize. Output
  is NHWC float32 (TPU-native layout).
* ``device_preprocess`` — on-device XLA stage (uint8 -> resize -> normalize)
  that fuses into the jitted encoder for the serving path, avoiding host
  preprocessing bottlenecks.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def image_transform(image_size: int = 224):
    """Returns fn(PIL.Image) -> np.float32 [H, W, 3], reference-parity."""
    from PIL import Image

    mean = np.asarray(OPENAI_MEAN, np.float32)
    std = np.asarray(OPENAI_STD, np.float32)

    def transform(img) -> np.ndarray:
        img = img.resize((image_size, image_size), Image.BICUBIC)
        img = img.convert("RGB")
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - mean) / std

    return transform


def preprocess_batch(images, image_size: int = 224) -> np.ndarray:
    """PIL images / arrays -> [N, image_size, image_size, 3] float32."""
    t = image_transform(image_size)
    from PIL import Image

    out = []
    for im in images:
        if isinstance(im, np.ndarray):
            im = Image.fromarray(im)
        out.append(t(im))
    return np.stack(out)


def device_preprocess(raw: "jax.Array", image_size: int = 224) -> "jax.Array":
    """uint8 [N, H, W, 3] on device -> normalized float [N, R, R, 3].

    Bicubic resize (matching the reference transform, image_transform, and
    the eval path in data/augment.py — a bilinear serving path would feed
    the model slightly different pixels than evaluation saw) + normalize
    inside the jitted graph; used by the AOT serving path (replaces the
    reference's host-side torchvision stage feeding TensorRT).
    """
    import jax
    import jax.numpy as jnp

    x = raw.astype(jnp.float32) / 255.0
    if raw.shape[1] != image_size or raw.shape[2] != image_size:
        x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3), "cubic")
    mean = jnp.asarray(OPENAI_MEAN, x.dtype)
    std = jnp.asarray(OPENAI_STD, x.dtype)
    return (x - mean) / std
