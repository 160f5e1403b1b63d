"""AutoAugment 'original' (ImageNet policy) — fully on device.

The reference's train transform is timm ``create_transform(...,
auto_augment='original')`` running on host CPU workers
(training/data.py:72-83). Here the complete policy runs inside the jitted
step on the VPU: 25 sub-policies of (op, prob, magnitude) pairs, with

* geometric ops (Rotate, ShearX) via bilinear ``map_coordinates`` affine
  sampling (static shapes, XLA-friendly);
* pointwise ops (Posterize, Solarize, Invert, Color, Contrast, Brightness,
  Sharpness, AutoContrast, Equalize) implemented to match PIL semantics —
  Equalize reproduces ``ImageOps.equalize``'s LUT construction
  (step/cumsum), Sharpness PIL's smoothing kernel + blend.

Magnitude-to-argument mappings follow timm's ORIGINAL-policy conventions
exactly (level denominator 10): Posterize keeps ``4 + int(level/10*4)``
bits, Solarize threshold is ``int(level/10*256)`` (higher level = milder,
the paper's quirk), enhance factors are ``level/10*1.8 + 0.1`` with NO
sign randomization, Rotate/Shear are ``level/10*{30deg, 0.3}`` randomly
negated. Geometric ops fill out-of-bounds with timm's ``img_mean`` gray
(round(255*CLIP_MEAN) = (123, 117, 104)), not black. Known deviation:
sampling is bilinear (map_coordinates order=1) where timm passes bicubic
— interiors differ by ~1 gray level; documented rather than hidden.

Ops operate on float images in [0, 255] (uint8 value grid) per image;
randomness comes from the per-image PRNG key. Each op is golden-tested
against PIL in tests/test_autoaugment.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# timm aa_params img_mean: round(255 * CLIP mean) — geometric-op fill color
FILL = (123, 117, 104)

# The canonical AutoAugment ImageNet ("original") policy:
# 25 sub-policies of ((op, prob, magnitude), (op, prob, magnitude)).
IMAGENET_POLICY = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, 7), ("Solarize", 0.4, 4)),
    (("Equalize", 0.4, 4), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, 7)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, 2)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, 8), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, 2)),
    (("Equalize", 0.0, 7), ("Equalize", 0.8, 8)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, 8)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, 9)),
    (("Color", 0.4, 0), ("Equalize", 0.6, 3)),
    (("Equalize", 0.4, 7), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
]

OP_NAMES = ["Identity", "Posterize", "Rotate", "Solarize", "AutoContrast",
            "Equalize", "Invert", "Color", "Contrast", "Brightness",
            "Sharpness", "ShearX", "ShearY"]
_OP_INDEX = {n: i for i, n in enumerate(OP_NAMES)}


# ---------------------------------------------------------------------------
# Individual ops. img: [H, W, 3] float32 in [0, 255]. ``level`` is the raw
# 0-10 policy magnitude (timm _LEVEL_DENOM = 10); ``sign`` is +/-1, drawn
# per application and consumed ONLY by the geometric ops (timm randomly
# negates rotate/shear but never the enhance factors).
# ---------------------------------------------------------------------------

def _identity(img, level, sign):
    return img


def _posterize(img, level, sign):
    # timm _posterize_original_level_to_arg: keep 4 + int(level/10*4) bits
    bits = 4 + (level * 0.4).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.uint8)
    xi = jnp.clip(img, 0, 255).astype(jnp.uint8)
    return ((xi >> shift) << shift).astype(img.dtype)


def _solarize(img, level, sign):
    # timm _solarize_level_to_arg: threshold int(level/10*256) — HIGHER
    # level = HIGHER threshold = milder (the original paper's convention)
    thresh = jnp.floor(level * 25.6)
    return jnp.where(img >= thresh, 255.0 - img, img)


def _invert(img, level, sign):
    return 255.0 - img


def _autocontrast(img, level, sign):
    # PIL ImageOps.autocontrast(cutoff=0): per-channel remap min->0, max->255
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _equalize(img, level, sign):
    # PIL ImageOps.equalize LUT: step = (npixels - count[last nonzero]) // 255
    # lut[i] = (step//2 + cumsum_exclusive(h)[i]) // step  (identity if step==0)
    def chan(c):
        xi = jnp.clip(c, 0, 255).astype(jnp.int32)
        h = jnp.bincount(xi.reshape(-1), length=256)
        nonzero = h > 0
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        last_count = h[last_idx]
        step = (jnp.sum(h) - last_count) // 255
        cum = jnp.concatenate([jnp.zeros((1,), h.dtype), jnp.cumsum(h)[:-1]])
        lut = (step // 2 + cum) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        out = lut[xi].astype(c.dtype)
        return jnp.where(step == 0, c, out)

    return jnp.stack([chan(img[..., k]) for k in range(3)], axis=-1)


def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0.0, 255.0)


def _enhance_factor(level):
    # timm _enhance_level_to_arg: factor = level/10*1.8 + 0.1 (NOT signed)
    return level * 0.18 + 0.1


def _color(img, level, sign):
    # blend with grayscale (ITU-R 601-2 luma, like PIL convert("L"))
    gray = (img[..., 0] * 299 + img[..., 1] * 587 + img[..., 2] * 114) / 1000.0
    gray = jnp.floor(gray)[..., None] * jnp.ones_like(img)
    return _blend(img, gray, _enhance_factor(level))


def _contrast(img, level, sign):
    gray = (img[..., 0] * 299 + img[..., 1] * 587 + img[..., 2] * 114) / 1000.0
    # PIL: mean of the L image (integer), +0.5 rounding
    mean = jnp.floor(jnp.mean(jnp.floor(gray)) + 0.5)
    return _blend(img, jnp.full_like(img, mean), _enhance_factor(level))


def _brightness(img, level, sign):
    return _blend(img, jnp.zeros_like(img), _enhance_factor(level))


def _sharpness(img, level, sign):
    # PIL ImageFilter.SMOOTH: kernel [[1,1,1],[1,5,1],[1,1,1]]/13, border kept
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0].transpose(1, 2, 0)
    # PIL keeps the 1-pixel border unfiltered
    hh, ww = img.shape[0], img.shape[1]
    ys = jnp.arange(hh)[:, None, None]
    xs = jnp.arange(ww)[None, :, None]
    interior = (ys > 0) & (ys < hh - 1) & (xs > 0) & (xs < ww - 1)
    smoothed = jnp.where(interior, smoothed, img)
    return _blend(img, smoothed, _enhance_factor(level))


def _affine_sample(img, a, b, c, d, e, f):
    """PIL-convention inverse affine: out pixel (x, y) samples
    in(a(x+.5)+b(y+.5)+c-.5, d(x+.5)+e(y+.5)+f-.5) — PIL's bilinear
    transform uses pixel-center coordinates. Out-of-bounds pixels fill
    with timm's img_mean gray (FILL), like the reference's fillcolor."""
    hh, ww = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32) + 0.5,
                          jnp.arange(ww, dtype=jnp.float32) + 0.5, indexing="ij")
    sx = a * xs + b * ys + c - 0.5
    sy = d * xs + e * ys + f - 0.5
    coords = jnp.stack([sy, sx])
    # validity mask sampled alongside so partially-covered border pixels
    # blend toward the fill color exactly like PIL's fillcolor
    ones = jnp.ones(img.shape[:2], jnp.float32)

    def chan(cimg):
        return jax.scipy.ndimage.map_coordinates(cimg, coords, order=1,
                                                 mode="constant")

    cov = jax.scipy.ndimage.map_coordinates(ones, coords, order=1,
                                            mode="constant")[..., None]
    fill = jnp.asarray(FILL, img.dtype)
    out = jnp.stack([chan(img[..., k]) for k in range(3)], axis=-1)
    return out + (1.0 - cov) * fill


def _rotate(img, level, sign):
    # timm _rotate_level_to_arg: level/10*30 degrees, randomly negated
    theta = sign * level * 3.0 * jnp.pi / 180.0
    hh, ww = img.shape[0], img.shape[1]
    cx, cy = ww / 2.0, hh / 2.0  # PIL rotates about the exact center
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse rotation
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_sample(img, a, b, c, d, e, f)


def _shear_x(img, level, sign):
    s = sign * level * 0.03  # timm _shear_level_to_arg: level/10*0.3
    return _affine_sample(img, 1.0, s, 0.0, 0.0, 1.0, 0.0)


def _shear_y(img, level, sign):
    s = sign * level * 0.03
    return _affine_sample(img, 1.0, 0.0, 0.0, s, 1.0, 0.0)


_OP_FNS = [_identity, _posterize, _rotate, _solarize, _autocontrast,
           _equalize, _invert, _color, _contrast, _brightness, _sharpness,
           _shear_x, _shear_y]


def _policy_tables():
    ops = []
    probs = []
    mags = []
    for (op1, p1, m1), (op2, p2, m2) in IMAGENET_POLICY:
        ops.append((_OP_INDEX[op1], _OP_INDEX[op2]))
        probs.append((p1, p2))
        mags.append((float(m1), float(m2)))  # RAW 0-10 levels (timm denom 10)
    return (jnp.asarray(ops, jnp.int32), jnp.asarray(probs, jnp.float32),
            jnp.asarray(mags, jnp.float32))


# only the geometric ops are randomly negated (timm: enhance factors are
# NOT sign-randomized). Plain numpy: a module-level jnp array would
# initialize the JAX backend as an import side effect, locking the
# platform before callers can force CPU.
_SIGNED_OPS = {_OP_INDEX[n] for n in ("Rotate", "ShearX", "ShearY")}
_SIGNED_MASK = np.asarray([1.0 if i in _SIGNED_OPS else 0.0
                           for i in range(len(OP_NAMES))], np.float32)


def auto_augment(rng: jax.Array, img: jax.Array) -> jax.Array:
    """Apply one random ImageNet sub-policy. img: [H, W, 3] float [0,255]."""
    ops_t, probs_t, mags_t = _policy_tables()
    k_pol, k_a1, k_a2, k_s1, k_s2 = jax.random.split(rng, 5)
    pol = jax.random.randint(k_pol, (), 0, len(IMAGENET_POLICY))

    signed_mask = jnp.asarray(_SIGNED_MASK)

    def apply_op(img, op_idx, level, sign_rng):
        sign = jnp.where(jax.random.bernoulli(sign_rng), 1.0, -1.0)
        sign = jnp.where(signed_mask[op_idx] > 0, sign, 1.0)
        return jax.lax.switch(op_idx, _OP_FNS, img, level, sign)

    def maybe(img, slot, apply_rng, sign_rng):
        op_idx = ops_t[pol, slot]
        prob = probs_t[pol, slot]
        level = mags_t[pol, slot]
        applied = apply_op(img, op_idx, level, sign_rng)
        do = jax.random.uniform(jax.random.fold_in(apply_rng, 1)) < prob
        return jnp.where(do, applied, img)

    img = maybe(img, 0, k_a1, k_s1)
    img = maybe(img, 1, k_a2, k_s2)
    return img
