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

Ops operate on float images in [0, 255] (uint8 value grid) per image;
randomness comes from the per-image PRNG key. Each op is golden-tested
against PIL in tests/test_autoaugment.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
# Individual ops. img: [H, W, 3] float32 in [0, 255]. signed_mag in [-1, 1]
# is magnitude/9 with a random sign (geometric/enhance ops use it).
# ---------------------------------------------------------------------------

def _identity(img, signed_mag):
    return img


def _posterize(img, signed_mag):
    # original policy range: 8 -> 4 bits as |mag| goes 0 -> 1
    bits = 8 - (jnp.abs(signed_mag) * 4).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.uint8)
    xi = jnp.clip(img, 0, 255).astype(jnp.uint8)
    return ((xi >> shift) << shift).astype(img.dtype)


def _solarize(img, signed_mag):
    # threshold 256 -> 0 as |mag| goes 0 -> 1 (invert above threshold)
    thresh = 256.0 * (1.0 - jnp.abs(signed_mag))
    return jnp.where(img >= thresh, 255.0 - img, img)


def _invert(img, signed_mag):
    return 255.0 - img


def _autocontrast(img, signed_mag):
    # PIL ImageOps.autocontrast(cutoff=0): per-channel remap min->0, max->255
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _equalize(img, signed_mag):
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


def _enhance_factor(signed_mag):
    # PIL-enhance convention from the original code: factor = 1 + signed*0.9
    return 1.0 + signed_mag * 0.9


def _color(img, signed_mag):
    # blend with grayscale (ITU-R 601-2 luma, like PIL convert("L"))
    gray = (img[..., 0] * 299 + img[..., 1] * 587 + img[..., 2] * 114) / 1000.0
    gray = jnp.floor(gray)[..., None] * jnp.ones_like(img)
    return _blend(img, gray, _enhance_factor(signed_mag))


def _contrast(img, signed_mag):
    gray = (img[..., 0] * 299 + img[..., 1] * 587 + img[..., 2] * 114) / 1000.0
    # PIL: mean of the L image (integer), +0.5 rounding
    mean = jnp.floor(jnp.mean(jnp.floor(gray)) + 0.5)
    return _blend(img, jnp.full_like(img, mean), _enhance_factor(signed_mag))


def _brightness(img, signed_mag):
    return _blend(img, jnp.zeros_like(img), _enhance_factor(signed_mag))


def _sharpness(img, signed_mag):
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
    return _blend(img, smoothed, _enhance_factor(signed_mag))


def _affine_sample(img, a, b, c, d, e, f):
    """PIL-convention inverse affine: out pixel (x, y) samples
    in(a(x+.5)+b(y+.5)+c-.5, d(x+.5)+e(y+.5)+f-.5) — PIL's bilinear
    transform uses pixel-center coordinates. Zero fill outside."""
    hh, ww = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32) + 0.5,
                          jnp.arange(ww, dtype=jnp.float32) + 0.5, indexing="ij")
    sx = a * xs + b * ys + c - 0.5
    sy = d * xs + e * ys + f - 0.5
    coords = jnp.stack([sy, sx])

    def chan(cimg):
        return jax.scipy.ndimage.map_coordinates(cimg, coords, order=1, mode="constant")

    return jnp.stack([chan(img[..., k]) for k in range(3)], axis=-1)


def _rotate(img, signed_mag):
    # max 30 degrees, about the center, zero fill (PIL rotate semantics)
    theta = signed_mag * 30.0 * jnp.pi / 180.0
    hh, ww = img.shape[0], img.shape[1]
    cx, cy = ww / 2.0, hh / 2.0  # PIL rotates about the exact center
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse rotation
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_sample(img, a, b, c, d, e, f)


def _shear_x(img, signed_mag):
    s = signed_mag * 0.3
    return _affine_sample(img, 1.0, s, 0.0, 0.0, 1.0, 0.0)


def _shear_y(img, signed_mag):
    s = signed_mag * 0.3
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
        mags.append((m1 / 9.0, m2 / 9.0))
    return (jnp.asarray(ops, jnp.int32), jnp.asarray(probs, jnp.float32),
            jnp.asarray(mags, jnp.float32))


_SIGNED_OPS = {_OP_INDEX[n] for n in
               ("Rotate", "ShearX", "ShearY", "Color", "Contrast",
                "Brightness", "Sharpness")}
_SIGNED_MASK = jnp.asarray([1.0 if i in _SIGNED_OPS else 0.0
                            for i in range(len(OP_NAMES))])


def auto_augment(rng: jax.Array, img: jax.Array) -> jax.Array:
    """Apply one random ImageNet sub-policy. img: [H, W, 3] float [0,255]."""
    ops_t, probs_t, mags_t = _policy_tables()
    k_pol, k_a1, k_a2, k_s1, k_s2 = jax.random.split(rng, 5)
    pol = jax.random.randint(k_pol, (), 0, len(IMAGENET_POLICY))

    def apply_op(img, op_idx, mag, apply_rng, sign_rng):
        do = jax.random.uniform(apply_rng) < 1.0  # prob applied by caller
        sign = jnp.where(jax.random.bernoulli(sign_rng), 1.0, -1.0)
        signed = mag * jnp.where(_SIGNED_MASK[op_idx] > 0, sign, 1.0)
        return jax.lax.switch(op_idx, _OP_FNS, img, signed)

    def maybe(img, slot, apply_rng, sign_rng):
        op_idx = ops_t[pol, slot]
        prob = probs_t[pol, slot]
        mag = mags_t[pol, slot]
        applied = apply_op(img, op_idx, mag, apply_rng, sign_rng)
        do = jax.random.uniform(jax.random.fold_in(apply_rng, 1)) < prob
        return jnp.where(do, applied, img)

    img = maybe(img, 0, k_a1, k_s1)
    img = maybe(img, 1, k_a2, k_s2)
    return img
