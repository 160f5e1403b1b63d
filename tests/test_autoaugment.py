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


def _ours(fn, img_u8, signed_mag=0.0):
    out = fn(jnp.asarray(img_u8, jnp.float32), jnp.asarray(signed_mag))
    return np.asarray(jnp.clip(jnp.round(out), 0, 255), np.uint8)


def test_invert(img):
    ref = np.asarray(ImageOps.invert(Image.fromarray(img)))
    np.testing.assert_array_equal(_ours(aa._invert, img), ref)


@pytest.mark.parametrize("bits", [4, 6, 7])
def test_posterize(img, bits):
    ref = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
    signed = (8 - bits) / 4.0
    np.testing.assert_array_equal(_ours(aa._posterize, img, signed), ref)


@pytest.mark.parametrize("thresh", [64, 128, 200])
def test_solarize(img, thresh):
    ref = np.asarray(ImageOps.solarize(Image.fromarray(img), thresh))
    signed = 1.0 - thresh / 256.0
    np.testing.assert_array_equal(_ours(aa._solarize, img, signed), ref)


def test_autocontrast(img):
    ref = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    out = _ours(aa._autocontrast, img)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1  # rounding


def test_equalize(img):
    ref = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    out = _ours(aa._equalize, img)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("factor", [0.3, 1.0, 1.7])
def test_enhance_ops(img, factor):
    signed = (factor - 1.0) / 0.9
    for ours_fn, pil_cls in ((aa._color, ImageEnhance.Color),
                             (aa._contrast, ImageEnhance.Contrast),
                             (aa._brightness, ImageEnhance.Brightness)):
        ref = np.asarray(pil_cls(Image.fromarray(img)).enhance(factor))
        out = _ours(ours_fn, img, signed)
        err = np.abs(out.astype(int) - ref.astype(int)).max()
        assert err <= 2, (pil_cls.__name__, factor, err)


def test_sharpness(img):
    factor = 1.7
    ref = np.asarray(ImageEnhance.Sharpness(Image.fromarray(img)).enhance(factor))
    out = _ours(aa._sharpness, img, (factor - 1.0) / 0.9)
    err = np.abs(out.astype(int) - ref.astype(int)).max()
    assert err <= 2, err


@pytest.mark.parametrize("deg", [10, -25])
def test_rotate(img, deg):
    ref = np.asarray(Image.fromarray(img).rotate(deg, resample=Image.BILINEAR))
    out = _ours(aa._rotate, img, deg / 30.0)
    # interiors agree; borders differ by fill conventions
    diff = np.abs(out[4:-4, 4:-4].astype(int) - ref[4:-4, 4:-4].astype(int))
    assert np.mean(diff) < 3.0, np.mean(diff)


def test_shear(img):
    s = 0.2
    ref = np.asarray(Image.fromarray(img).transform(
        img.shape[1::-1], Image.AFFINE, (1, s, 0, 0, 1, 0), Image.BILINEAR))
    out = _ours(aa._shear_x, img, s / 0.3)
    diff = np.abs(out[2:-2, 2:-2].astype(int) - ref[2:-2, 2:-2].astype(int))
    assert np.mean(diff) < 2.0, np.mean(diff)


def test_auto_augment_runs_and_varies(img):
    x = jnp.asarray(img, jnp.float32)
    outs = [np.asarray(aa.auto_augment(jax.random.PRNGKey(i), x)) for i in range(6)]
    for o in outs:
        assert o.shape == img.shape
        assert np.isfinite(o).all()
        assert o.min() >= 0.0 and o.max() <= 255.0
    # different keys should not all produce identical outputs
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])
