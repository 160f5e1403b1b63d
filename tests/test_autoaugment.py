"""On-device AutoAugment ops vs PIL golden implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from nans_clip_tpu.data import autoaugment as aa


@pytest.fixture(scope="module")
def img():
    rs = np.random.RandomState(0)
    # structured + noise so equalize/autocontrast have real histograms
    x = np.linspace(0, 200, 48)[:, None, None] + rs.randint(0, 55, (48, 48, 3))
    return np.clip(x, 0, 255).astype(np.uint8)


def _ours(fn, img_u8, level=0.0, sign=1.0):
    out = fn(jnp.asarray(img_u8, jnp.float32), jnp.asarray(level),
             jnp.asarray(sign))
    return np.asarray(jnp.clip(jnp.round(out), 0, 255), np.uint8)


def test_invert(img):
    ref = np.asarray(ImageOps.invert(Image.fromarray(img)))
    np.testing.assert_array_equal(_ours(aa._invert, img), ref)


@pytest.mark.parametrize("level,bits", [(0, 4), (5, 6), (8, 7)])
def test_posterize(img, level, bits):
    # timm original: keep 4 + int(level/10*4) bits
    ref = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
    np.testing.assert_array_equal(_ours(aa._posterize, img, level), ref)


@pytest.mark.parametrize("level", [3, 5, 8])
def test_solarize(img, level):
    # timm original: threshold int(level/10*256) — higher level = milder
    thresh = int(level * 25.6)
    ref = np.asarray(ImageOps.solarize(Image.fromarray(img), thresh))
    np.testing.assert_array_equal(_ours(aa._solarize, img, level), ref)


def test_autocontrast(img):
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    out = _ours(aa._autocontrast, img)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1  # rounding


def test_equalize(img):
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    out = _ours(aa._equalize, img)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("level", [1, 5, 9])
def test_enhance_ops(img, level):
    # timm original: factor = level/10*1.8 + 0.1, never sign-flipped
    factor = level * 0.18 + 0.1
    for ours_fn, pil_cls in ((aa._color, ImageEnhance.Color),
                             (aa._contrast, ImageEnhance.Contrast),
                             (aa._brightness, ImageEnhance.Brightness)):
        ref = np.asarray(pil_cls(Image.fromarray(img)).enhance(factor))
        out = _ours(ours_fn, img, level)
        err = np.abs(out.astype(int) - ref.astype(int)).max()
        assert err <= 2, (pil_cls.__name__, factor, err)


def test_sharpness(img):
    level = 9
    factor = level * 0.18 + 0.1
    ref = np.asarray(ImageEnhance.Sharpness(Image.fromarray(img)).enhance(factor))
    out = _ours(aa._sharpness, img, level)
    err = np.abs(out.astype(int) - ref.astype(int)).max()
    assert err <= 2, err


@pytest.mark.parametrize("deg", [10, -25])
def test_rotate(img, deg):
    # timm fills out-of-bounds with img_mean gray — compare full frames
    # against PIL with the same fillcolor
    ref = np.asarray(Image.fromarray(img).rotate(
        deg, resample=Image.BILINEAR, fillcolor=aa.FILL))
    out = _ours(aa._rotate, img, abs(deg) / 3.0, sign=np.sign(deg))
    diff = np.abs(out[1:-1, 1:-1].astype(int) - ref[1:-1, 1:-1].astype(int))
    assert np.mean(diff) < 3.0, np.mean(diff)


def test_shear(img):
    s = 0.21  # level 7 * 0.03
    ref = np.asarray(Image.fromarray(img).transform(
        img.shape[1::-1], Image.AFFINE, (1, s, 0, 0, 1, 0), Image.BILINEAR,
        fillcolor=aa.FILL))
    out = _ours(aa._shear_x, img, 7.0)
    diff = np.abs(out[1:-1, 1:-1].astype(int) - ref[1:-1, 1:-1].astype(int))
    assert np.mean(diff) < 2.0, np.mean(diff)


def test_timm_level_mappings():
    """The policy levels map to PIL args exactly like timm's ORIGINAL
    conventions (denominator 10): the paper's ('Solarize', 0.6, 8) is a
    MILD threshold 204, not a near-total inversion."""
    img = np.full((8, 8, 3), 210, np.uint8)
    # threshold 204 < 210: inverted; threshold 230 (level 9) > 210: kept
    out8 = _ours(aa._solarize, img, 8)
    out9 = _ours(aa._solarize, img, 9)
    assert (out8 == 45).all() and (out9 == 210).all()
    # ('Color', 0.4, 0) is factor 0.1 (near-grayscale), not a no-op
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 200
    out = _ours(aa._color, rgb, 0)
    assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() < 60
    # posterize level 8 keeps 7 bits (timm int(8*0.4)+4), not 5
    out = _ours(aa._posterize, np.full((2, 2, 3), 0b1111_1111, np.uint8), 8)
    assert (out == 0b1111_1110).all()


def test_auto_augment_runs_and_varies(img):
    x = jnp.asarray(img, jnp.float32)
    outs = [np.asarray(aa.auto_augment(jax.random.PRNGKey(i), x)) for i in range(6)]
    for o in outs:
        assert o.shape == img.shape
        assert np.isfinite(o).all()
        assert o.min() >= 0.0 and o.max() <= 255.0
    # different keys should not all produce identical outputs
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])
