"""Native decode + PIL-bit-exact bicubic resize (csrc/npack.cpp r4).

The serving daemon's fast image path must feed the model the SAME pixels
the eval transform produces (utils/transform.py image_transform — PIL
bicubic). The native kernel reimplements Pillow's Resample.c (two-pass,
uint8 intermediate, INT32 fixed-point at PRECISION_BITS=22, clip8), so the
gate here is EXACT byte equality, not a tolerance."""

import io

import numpy as np
import pytest

from nans_clip_tpu.data.npack import (decode_jpeg_pil_batch, get_native_lib,
                                      resize_bicubic)


def _pil_resize(arr, oh, ow):
    from PIL import Image
    return np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BICUBIC),
                      np.uint8)


@pytest.mark.parametrize("h,w,oh,ow", [
    (300, 500, 224, 224),   # downscale (antialias support scaling)
    (64, 64, 224, 224),     # upscale
    (224, 224, 224, 224),   # identity size (still runs the kernel)
    (13, 17, 224, 224),     # tiny, kernel wider than the image
    (50, 1200, 224, 224),   # extreme aspect ratio
    (224, 224, 336, 336),   # the L-336 resolution
    (1000, 700, 64, 64),    # deep downscale
    (1, 1, 8, 8),           # degenerate
])
def test_resize_bicubic_matches_pil_exactly(h, w, oh, ow):
    rs = np.random.RandomState(h * 1000 + w)
    arr = rs.randint(0, 256, (h, w, 3), np.uint8)
    np.testing.assert_array_equal(resize_bicubic(arr, oh, ow),
                                  _pil_resize(arr, oh, ow))


def test_resize_gradient_image_exact():
    """Smooth content exercises different clip8 rounding paths than noise."""
    y, x = np.mgrid[0:300, 0:400]
    arr = np.stack([(x * 255 // 399), (y * 255 // 299),
                    ((x + y) * 255 // 698)], -1).astype(np.uint8)
    np.testing.assert_array_equal(resize_bicubic(arr, 224, 224),
                                  _pil_resize(arr, 224, 224))


def _jpeg_bytes(arr, quality=90, mode=None):
    from PIL import Image
    img = Image.fromarray(arr) if mode is None else \
        Image.fromarray(arr).convert(mode)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_batch_matches_pil_transform_exactly():
    """Full decode + resize == Image.open().resize(BICUBIC).convert('RGB')
    byte-for-byte (same libjpeg islow path on both sides)."""
    from PIL import Image
    rs = np.random.RandomState(7)
    bufs = [_jpeg_bytes(rs.randint(0, 256, (h, w, 3), np.uint8))
            for h, w in [(300, 400), (64, 64), (555, 333)]]
    out, ok = decode_jpeg_pil_batch(bufs, 224)
    assert ok.all()
    for i, b in enumerate(bufs):
        pil = np.asarray(Image.open(io.BytesIO(b)).resize(
            (224, 224), Image.BICUBIC).convert("RGB"), np.uint8)
        np.testing.assert_array_equal(out[i], pil, err_msg=f"image {i}")


def test_decode_grayscale_jpeg_exact():
    """L-mode JPEG: resize-in-L-then-replicate (the PIL transform order)
    equals decode-to-RGB-then-resize — both sides bit-equal."""
    from PIL import Image
    rs = np.random.RandomState(8)
    b = _jpeg_bytes(rs.randint(0, 256, (120, 90), np.uint8))
    out, ok = decode_jpeg_pil_batch([b], 224)
    assert ok.all()
    pil = np.asarray(Image.open(io.BytesIO(b)).resize(
        (224, 224), Image.BICUBIC).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(out[0], pil)


def test_decode_flags_failures_not_crashes():
    rs = np.random.RandomState(9)
    good = _jpeg_bytes(rs.randint(0, 256, (60, 60, 3), np.uint8))
    out, ok = decode_jpeg_pil_batch(
        [good, b"not a jpeg", good[: len(good) // 2], b""], 64)
    assert ok.tolist() == [1, 0, 0, 0]
    assert out[1].sum() == 0 and out[3].sum() == 0


def test_dct_scale_mode_bounded_drift():
    """--fast-decode (DCT-scaled) is NOT bit-exact; its drift vs the exact
    path stays small (measured r4: mean ~0.6/255, max ~15 on a noisy 1080p
    source at 2.5x the host speed — the PIL draft-mode trade)."""
    rs = np.random.RandomState(12)
    y, x = np.mgrid[0:540, 0:960]
    arr = (np.stack([x % 256, y % 256, (x + y) % 256], -1)
           + rs.randint(0, 30, (540, 960, 3))).clip(0, 255).astype(np.uint8)
    b = _jpeg_bytes(arr, quality=90)
    exact, ok1 = decode_jpeg_pil_batch([b], 224)
    fast, ok2 = decode_jpeg_pil_batch([b], 224, dct_scale=True)
    assert ok1.all() and ok2.all()
    d = np.abs(exact[0].astype(int) - fast[0].astype(int))
    assert d.mean() < 3.0 and d.max() < 64, (d.mean(), d.max())


def test_decompression_bomb_refused():
    """A crafted SOF claiming 60000x60000 must come back ok=0 (the PIL
    MAX_IMAGE_PIXELS analog in csrc) instead of allocating 10.8 GB; the
    server's PIL fallback then raises DecompressionBombError -> 400."""
    rs = np.random.RandomState(14)
    b = bytearray(_jpeg_bytes(rs.randint(0, 256, (32, 32, 3), np.uint8)))
    i = b.find(b"\xff\xc0")
    assert i > 0
    b[i + 5:i + 7] = (60000).to_bytes(2, "big")
    b[i + 7:i + 9] = (60000).to_bytes(2, "big")
    if get_native_lib() is None:
        pytest.skip("native lib unavailable")
    out, ok = decode_jpeg_pil_batch([bytes(b)], 64)
    assert ok.tolist() == [0]


def test_png_is_refused_by_native_path():
    """PNG bytes must come back ok=0 (the server falls back to PIL), not
    garbage."""
    from PIL import Image
    rs = np.random.RandomState(10)
    buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 256, (50, 50, 3), np.uint8)).save(
        buf, format="PNG")
    if get_native_lib() is None:
        pytest.skip("native lib unavailable (pure-python fallback decodes PNG)")
    out, ok = decode_jpeg_pil_batch([buf.getvalue()], 64)
    assert ok.tolist() == [0]


def test_server_native_and_pil_paths_identical():
    """The daemon's two decode paths produce identical features (tiny
    model, CPU): the fast path is a pure host-time optimization."""
    import base64

    import jax

    from nans_clip_tpu.configs import tiny_config
    from nans_clip_tpu.deploy.server import ClipService
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip

    cfg = tiny_config()
    params, batch_stats = init_clip(jax.random.PRNGKey(0), cfg)
    opts = ModelOptions(attn_impl="xla")
    rs = np.random.RandomState(11)
    jpeg = _jpeg_bytes(rs.randint(0, 256, (100, 140, 3), np.uint8))
    from PIL import Image
    png_buf = io.BytesIO()
    Image.fromarray(rs.randint(0, 256, (80, 80, 3), np.uint8)).save(
        png_buf, format="PNG")
    images = [base64.b64encode(jpeg).decode(),
              base64.b64encode(png_buf.getvalue()).decode()]  # PNG fallback

    f_native = ClipService(cfg, params, batch_stats, opts, max_batch=4,
                           dynamic_batching=False).encode_images(images)
    f_pil = ClipService(cfg, params, batch_stats, opts, max_batch=4,
                        dynamic_batching=False,
                        native_decode=False).encode_images(images)
    np.testing.assert_array_equal(f_native, f_pil)

    # --fast-decode flows end-to-end too (not bit-exact; features of the
    # same images must stay close, PNG still falls back to PIL)
    f_fast = ClipService(cfg, params, batch_stats, opts, max_batch=4,
                         dynamic_batching=False,
                         fast_decode=True).encode_images(images)
    assert f_fast.shape == f_native.shape
    np.testing.assert_allclose(f_fast, f_native, atol=0.2)
    np.testing.assert_array_equal(f_fast[1], f_native[1])  # PNG: PIL path

    with pytest.raises(ValueError, match="images\\[0\\]"):
        ClipService(cfg, params, batch_stats, opts, max_batch=4,
                    dynamic_batching=False).encode_images(["%%%notb64"])


def test_npack_reader_pil_exact_batch(tmp_path):
    """NPackReader.decode_jpeg_batch_pil (r4): pack-keyed decode with the
    PIL-bit-exact path — byte-equal to per-key PIL, missing keys ok=0.
    This is what makes `--image-transform native` in the eval stack
    produce the SAME pixels as the pil mode."""
    from PIL import Image

    from nans_clip_tpu.data.npack import NPackReader, NPackWriter

    rs = np.random.RandomState(15)
    path = str(tmp_path / "imgs.npack")
    arrs = {k: rs.randint(0, 256, (40 + 7 * k, 60, 3), np.uint8)
            for k in (1, 2, 5)}
    with NPackWriter(path) as w:
        for k, a in arrs.items():
            w.put(k, _jpeg_bytes(a))
    r = NPackReader(path)
    out, ok = r.decode_jpeg_batch_pil(np.asarray([1, 5, 99, 2], np.uint64), 48)
    assert ok.tolist() == [True, True, False, True]
    for i, k in ((0, 1), (1, 5), (3, 2)):
        pil = np.asarray(Image.open(io.BytesIO(r.get(k))).resize(
            (48, 48), Image.BICUBIC).convert("RGB"), np.uint8)
        np.testing.assert_array_equal(out[i], pil, err_msg=f"key {k}")
    assert out[2].sum() == 0
    r.close()


def test_device_normalize_matches_host_transform():
    """With the native decode already at target resolution, the on-device
    preprocess reduces to normalize; it must match the host transform's
    normalize so native-mode eval features equal pil-mode ones."""
    import jax

    from nans_clip_tpu.data import preprocess_images
    from nans_clip_tpu.utils.transform import image_transform
    from PIL import Image

    rs = np.random.RandomState(16)
    arr = rs.randint(0, 256, (64, 64, 3), np.uint8)
    host = image_transform(64)(Image.fromarray(arr))
    dev = np.asarray(preprocess_images(jax.random.PRNGKey(0), arr[None],
                                       64, augment=False))[0]
    np.testing.assert_allclose(dev, host, atol=1e-6)
