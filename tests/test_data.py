"""Data layer tests: npack store, native decode, builder, loader, augment."""

import base64
import io
import json
import os

import numpy as np
import pytest

from nans_clip_tpu.data import (DataLoader, NPackReader, NPackWriter,
                                PairDataset, decode_pair, encode_pair,
                                get_native_lib, pad_len, preprocess_text)
from nans_clip_tpu.preprocess.build_dataset import build_split


def _jpeg_bytes(rs, size=64):
    from PIL import Image
    arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue(), arr


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """Build a tiny dataset through the reference input format."""
    root = tmp_path_factory.mktemp("data")
    rs = np.random.RandomState(0)
    with open(root / "train_imgs.tsv", "w") as f:
        for i in range(10):
            raw, _ = _jpeg_bytes(rs)
            f.write(f"{i}\t{base64.urlsafe_b64encode(raw).decode()}\n")
    with open(root / "train_texts.jsonl", "w") as f:
        for t in range(7):
            f.write(json.dumps({"text_id": t, "text": f"南宋古籍第{t}卷",
                                "image_ids": [t, (t + 1) % 10]},
                               ensure_ascii=False) + "\n")
    meta = build_split(str(root), "train")
    assert meta["num_samples"] == 14
    assert meta["num_images"] == 10
    return str(root / "train")


def test_npack_roundtrip(tmp_path):
    path = str(tmp_path / "t.npack")
    with NPackWriter(path) as w:
        w.put(5, b"five")
        w.put(1, b"one")
        w.put(99, b"ninety-nine")
    r = NPackReader(path, native=False)
    assert len(r) == 3
    assert r.get(1) == b"one"
    assert r.get(5) == b"five"
    assert r.get(99) == b"ninety-nine"
    assert r.get(2) is None
    assert [k for k, _ in r] == [1, 5, 99]
    r.close()


def test_native_lib_builds_and_reads(tmp_path):
    lib = get_native_lib()
    assert lib is not None, "native npack lib failed to build"
    path = str(tmp_path / "n.npack")
    with NPackWriter(path) as w:
        for i in range(100):
            w.put(i * 3, f"value-{i}".encode())
    r = NPackReader(path, native=True)
    assert r._handle, "native open failed"
    assert r.get(27) == b"value-9"
    r.close()


def test_native_jpeg_decode(tmp_path):
    # Smooth gradient: DCT-scaled decode and PIL bilinear agree closely.
    # (On noise images they differ by design — different antialiasing.)
    from PIL import Image
    x = np.linspace(0, 255, 64)
    gx, gy = np.meshgrid(x, x)
    arr = np.stack([gx, gy, np.full((64, 64), 128.0)], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    raw = buf.getvalue()
    path = str(tmp_path / "img.npack")
    with NPackWriter(path) as w:
        w.put(7, raw)
    r = NPackReader(path)
    out, ok = r.decode_jpeg_batch(np.array([7, 8], np.uint64), 32)
    assert ok.tolist() == [True, False]
    assert out.shape == (2, 32, 32, 3)
    ref = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB").resize((32, 32), Image.BILINEAR), np.float32)
    err = np.abs(out[0].astype(np.float32) - ref).mean()
    assert err < 3.0, f"decode mismatch vs PIL: mean abs {err}"
    assert (out[1] == 0).all()
    r.close()


def test_pair_codec():
    raw = encode_pair(12, 34, "南宋“古籍”")
    assert decode_pair(raw) == (12, 34, "南宋“古籍”")


def test_preprocess_text():
    assert preprocess_text("ABC“x”") == 'abc"x"'


def test_pad_len():
    assert pad_len(14, 8) == 16
    assert pad_len(16, 8) == 16
    assert pad_len(1, 8) == 8


def test_loader_epoch(dataset_dir):
    ds = PairDataset(dataset_dir)
    loader = DataLoader(ds, batch_size=4, decode_size=32, shuffle=True,
                        seed=7, process_index=0, process_count=2)
    assert loader.num_batches == 2  # padded 14 -> 16, global batch 8
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b.images.shape == (4, 32, 32, 3)
        assert b.texts.shape == (4, 52)
        assert (b.texts[:, 0] == 101).all()
    # two processes see disjoint pair indices covering the padded epoch
    loader2 = DataLoader(ds, batch_size=4, decode_size=32, shuffle=True,
                         seed=7, process_index=1, process_count=2)
    ids_a = np.concatenate([b.text_ids for b in batches])
    ids_b = np.concatenate([b.text_ids for b in loader2])
    assert len(ids_a) + len(ids_b) == 16
    # determinism: same seed+epoch -> same order
    again = np.concatenate([b.text_ids for b in DataLoader(
        ds, batch_size=4, decode_size=32, shuffle=True, seed=7,
        process_index=0, process_count=2)])
    np.testing.assert_array_equal(ids_a, again)
    # different epoch -> different order
    loader.set_epoch(1)
    diff = np.concatenate([b.text_ids for b in loader])
    assert not np.array_equal(ids_a, diff)


def test_decode_failure_resampled(tmp_path, caplog):
    """A corrupt JPEG must be counted, logged, and replaced by resampling
    the whole pair (image AND caption) — not silently trained as zeros."""
    import logging as _logging

    root = tmp_path / "train"
    os.makedirs(root)
    rs = np.random.RandomState(0)
    good, _ = _jpeg_bytes(rs, 32)
    with NPackWriter(str(root / "imgs.npack")) as w:
        w.put(0, b"not a jpeg at all")   # corrupt
        w.put(1, good)
    with NPackWriter(str(root / "pairs.npack")) as w:
        w.put(0, encode_pair(0, 0, "坏图"))
        w.put(1, encode_pair(1, 1, "好图"))
    with open(root / "meta.json", "w") as f:
        json.dump({"num_samples": 2, "num_images": 2}, f)

    ds = PairDataset(str(root))
    loader = DataLoader(ds, batch_size=2, decode_size=32, shuffle=False)
    with caplog.at_level(_logging.WARNING):
        (batch,) = list(loader)
    assert loader.decode_failures == 1
    assert any("decode failed" in r.message for r in caplog.records)
    # the corrupt row was resampled onto the good pair, keeping pairing
    assert batch.image_ids.tolist() == [1, 1]
    assert batch.text_ids.tolist() == [1, 1]
    assert batch.images[0].any() and batch.images[1].any()
    np.testing.assert_array_equal(batch.texts[0], batch.texts[1])


def test_device_augment(dataset_dir):
    import jax

    from nans_clip_tpu.data import preprocess_images
    ds = PairDataset(dataset_dir)
    loader = DataLoader(ds, batch_size=4, decode_size=37, shuffle=False)
    batch = next(iter(loader))
    out = preprocess_images(jax.random.PRNGKey(0), batch.images, 32, augment=True)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # eval path: deterministic resize+normalize
    out2 = preprocess_images(jax.random.PRNGKey(0), batch.images, 32, augment=False)
    out3 = preprocess_images(jax.random.PRNGKey(1), batch.images, 32, augment=False)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out3))


def test_loader_mid_epoch_skip(dataset_dir):
    """set_epoch(e, start_batch=k) yields exactly the tail of the epoch's
    deterministic order — the mid-epoch resume fast-forward."""
    ds = PairDataset(dataset_dir)
    loader = DataLoader(ds, batch_size=4, decode_size=32, shuffle=True,
                        seed=7)
    loader.set_epoch(2)
    full = [b.text_ids for b in loader]
    assert len(full) == loader.num_batches
    loader.set_epoch(2, start_batch=1)
    tail = [b.text_ids for b in loader]
    assert len(tail) == len(full) - 1
    np.testing.assert_array_equal(np.concatenate(tail),
                                  np.concatenate(full[1:]))
    # a fresh epoch resets the offset only if set_epoch says so
    loader.set_epoch(3)
    assert len(list(loader)) == loader.num_batches


def test_loader_exact_decode_matches_pil(tmp_path):
    """DataLoader(exact_decode=True) yields the eval transform's exact
    pixels (PIL full decode + bicubic) — the reference's non-augment
    train-transform parity mode (--exact-decode)."""
    import io as _io

    from PIL import Image

    from nans_clip_tpu.data import DataLoader, PairDataset
    from nans_clip_tpu.data.npack import NPackWriter, encode_pair

    rs = np.random.RandomState(21)
    jpegs = {}
    with NPackWriter(str(tmp_path / "imgs.npack")) as wi, \
            NPackWriter(str(tmp_path / "pairs.npack")) as wp:
        for i in range(4):
            arr = rs.randint(0, 256, (50 + 9 * i, 70, 3), np.uint8)
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=92)
            jpegs[i] = buf.getvalue()
            wi.put(i, jpegs[i])
            wp.put(i, encode_pair(i, i, f"样本{i}"))
    ds = PairDataset(str(tmp_path))
    loader = DataLoader(ds, batch_size=4, decode_size=48, shuffle=False,
                        exact_decode=True)
    batch = next(iter(loader))
    for j in range(4):
        iid = int(batch.image_ids[j])
        pil = np.asarray(Image.open(_io.BytesIO(jpegs[iid])).resize(
            (48, 48), Image.BICUBIC).convert("RGB"), np.uint8)
        np.testing.assert_array_equal(batch.images[j], pil)
