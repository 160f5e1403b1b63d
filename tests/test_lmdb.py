"""LMDB file-format engine + compat API + lmdb->npack ingestion.

Covers SURVEY §2.9#6 / VERDICT round-1 item 7: reference-built LMDB
datasets load into this framework. The format itself (lmdb_store.py) is
exercised both directly and through the reference's own unmodified
build_lmdb_dataset.py / training data path (via tests/_shims)."""

import base64
import io
import json
import os
import builtins
import pickle
import subprocess
import sys

import numpy as np
import pytest

from nans_clip_tpu.data import lmdb_store as L
from tests.conftest import REFERENCE, requires_reference

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")
RUN_REF = os.path.join(SHIMS, "run_ref.py")


def _jpeg(rs, size=48):
    from PIL import Image
    arr = rs.randint(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def test_write_read_roundtrip(tmp_path):
    items = {f"{i}".encode(): f"v{i}".encode() * (i % 5 + 1) for i in range(2000)}
    path = str(tmp_path / "env")
    L.write_lmdb(path, items)
    r = L.LMDBReader(path)
    assert r.entries == 2000
    assert r.depth >= 2 and r.leaf_pages > 1  # branch pages exercised
    for k, v in items.items():
        assert r.get(k) == v
    assert r.get(b"nope") is None
    # cursor order is bytewise-sorted, like a real LMDB cursor
    assert list(r.items()) == sorted(items.items())
    r.close()


def test_overflow_values(tmp_path):
    rs = np.random.RandomState(0)
    items = {f"k{i}".encode(): rs.bytes(2000 + 11000 * i) for i in range(6)}
    path = str(tmp_path / "env")
    L.write_lmdb(path, items)
    r = L.LMDBReader(path)
    assert r.overflow_pages > 0
    for k, v in items.items():
        assert r.get(k) == v
    assert list(r.items()) == sorted(items.items())
    r.close()


def test_empty_env(tmp_path):
    path = str(tmp_path / "env")
    L.write_lmdb(path, {})
    r = L.LMDBReader(path)
    assert r.entries == 0
    assert r.get(b"x") is None
    assert list(r.items()) == []
    r.close()


def test_compat_api_sequential_commits(tmp_path):
    """The reference builder's pattern: many write txns, commit every N
    (preprocess/build_lmdb_dataset.py:66-95)."""
    path = str(tmp_path / "env")
    env = L.open(path, map_size=1 << 22)
    txn = env.begin(write=True)
    for i in range(250):
        txn.put(f"{i}".encode(), pickle.dumps((i, i, f"text-{i}")))
        if (i + 1) % 100 == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.put(b"num_samples", b"250")
    txn.commit()
    env.close()

    env = L.open(path, readonly=True, create=False, lock=False,
                 readahead=False, meminit=False)
    txn = env.begin(buffers=True)
    assert txn.get(b"num_samples").tobytes() == b"250"
    assert pickle.loads(txn.get(b"137").tobytes()) == (137, 137, "text-137")
    assert txn.get(b"missing") is None
    assert txn.stat()["entries"] == 251
    pairs = [(bytes(k), bytes(v)) for k, v in txn.cursor()]
    assert len(pairs) == 251
    assert pairs == sorted(pairs)
    env.close()


def test_context_manager_and_delete(tmp_path):
    path = str(tmp_path / "env")
    env = L.open(path)
    with env.begin(write=True) as txn:
        txn.put(b"a", b"1")
        txn.put(b"b", b"2")
    with env.begin() as txn:
        assert txn.get(b"a") == b"1"
    with env.begin(write=True) as txn:
        assert txn.delete(b"a")
    with env.begin() as txn:
        assert txn.get(b"a") is None
        assert txn.get(b"b") == b"2"
    env.close()


def _build_lmdb_split(root, n_imgs=6, n_texts=4, seed=0):
    """Write the reference raw-input files and build the LMDB split with the
    reference's OWN builder when mounted (else with our compat API using the
    reference's exact record layout)."""
    rs = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "valid_imgs.tsv"), "w") as f:
        for i in range(n_imgs):
            f.write(f"{i}\t{base64.urlsafe_b64encode(_jpeg(rs)).decode()}\n")
    with open(os.path.join(root, "valid_texts.jsonl"), "w") as f:
        for t in range(n_texts):
            f.write(json.dumps(
                {"text_id": t, "text": f"南宋古籍第{t}卷",
                 "image_ids": [t % n_imgs, (t + 1) % n_imgs]},
                ensure_ascii=False) + "\n")
    builder = os.path.join(REFERENCE, "cn_clip/preprocess/build_lmdb_dataset.py")
    if os.path.exists(builder):
        subprocess.run(
            [sys.executable, RUN_REF, builder, "--data_dir", root,
             "--splits", "valid"], check=True, capture_output=True, text=True)
    else:  # no reference mounted: same layout via the compat API
        split = os.path.join(root, "lmdb", "valid")
        env_i = L.open(os.path.join(split, "imgs"))
        env_p = L.open(os.path.join(split, "pairs"))
        ti = env_i.begin(write=True)
        tp = env_p.begin(write=True)
        widx = 0
        with open(os.path.join(root, "valid_texts.jsonl")) as f:
            for line in f:
                obj = json.loads(line)
                for image_id in obj["image_ids"]:
                    tp.put(str(widx).encode(),
                           pickle.dumps((image_id, obj["text_id"], obj["text"])))
                    widx += 1
        tp.put(b"num_samples", str(widx).encode())
        tp.commit()
        n = 0
        with open(os.path.join(root, "valid_imgs.tsv")) as f:
            for line in f:
                image_id, b64 = line.strip().split("\t")
                ti.put(image_id.encode(), b64.encode())
                n += 1
        ti.put(b"num_images", str(n).encode())
        ti.commit()
        env_i.close()
        env_p.close()
    return os.path.join(root, "lmdb", "valid")


def test_lmdb_split_converts_and_trains(tmp_path):
    """End-to-end ingestion: (reference-)built LMDB split -> PairDataset
    auto-converts -> DataLoader batches -> one train step."""
    import jax
    import jax.numpy as jnp

    from nans_clip_tpu.data import DataLoader, PairDataset, preprocess_images
    from nans_clip_tpu.models import ModelOptions
    from nans_clip_tpu.models.clip import init_clip
    from nans_clip_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)
    from tests.test_trainer import TINY

    split = _build_lmdb_split(str(tmp_path))
    ds = PairDataset(split)          # auto lmdb -> npack conversion
    assert ds.num_samples == 8 and ds.num_images == 6
    assert os.path.exists(os.path.join(split, "pairs.npack"))
    image_id, text_id, text = ds.get_pair(3)
    assert text.startswith("南宋古籍")

    loader = DataLoader(ds, batch_size=8, decode_size=32, shuffle=False)
    (batch,) = list(loader)
    assert batch.images.shape == (8, 32, 32, 3)
    assert loader.decode_failures == 0

    params, _ = init_clip(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(lr=1e-3, warmup=1, max_steps=2)
    state = create_train_state(params, {}, tcfg)
    step = make_train_step(TINY, tcfg, ModelOptions(attn_impl="xla"),
                           constrain=False)
    im = preprocess_images(jax.random.PRNGKey(0), jnp.asarray(batch.images),
                           32, augment=False)
    state, metrics = step(state, im, jnp.asarray(batch.texts),
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@requires_reference
def test_reference_training_data_reads_our_lmdb(tmp_path):
    """The reference's unmodified LMDBDataset (training/data.py) must read a
    split written by our LMDB engine — both directions of compatibility."""
    split = _build_lmdb_split(str(tmp_path))
    code = f"""
import sys
sys.path.insert(0, {SHIMS!r}); sys.path.insert(0, {REFERENCE!r})
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import pickle, lmdb
env = lmdb.open({os.path.join(split, 'pairs')!r}, readonly=True, create=False,
                lock=False, readahead=False, meminit=False)
txn = env.begin(buffers=True)
n = int(txn.get(key=b'num_samples').tobytes().decode('utf-8'))
assert n == 8, n
pair = pickle.loads(txn.get('3'.encode('utf-8')).tobytes())
assert len(pair) == 3 and pair[2].startswith('南宋古籍'), pair
print('REF-READ-OK')
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True)
    assert out.returncode == 0, out.stderr
    assert "REF-READ-OK" in out.stdout


def test_build_dataset_lmdb_format(tmp_path):
    """Our builder can emit the reference's LMDB layout; our converter and
    the reference record formats round-trip through it."""
    import pickle

    from nans_clip_tpu.preprocess.build_dataset import build_split_lmdb

    root = str(tmp_path)
    rs = np.random.RandomState(5)
    with builtins.open(os.path.join(root, "valid_imgs.tsv"), "w") as f:
        for i in range(3):
            f.write(f"{i}\t{base64.urlsafe_b64encode(_jpeg(rs)).decode()}\n")
    with builtins.open(os.path.join(root, "valid_texts.jsonl"), "w") as f:
        f.write(json.dumps({"text_id": 0, "text": "山水", "image_ids": [0, 2]},
                           ensure_ascii=False) + "\n")
    meta = build_split_lmdb(root, "valid")
    assert meta["num_samples"] == 2 and meta["num_images"] == 3
    pairs = L.LMDBReader(os.path.join(meta["out_dir"], "pairs"))
    assert int(pairs.get(b"num_samples")) == 2
    assert pickle.loads(pairs.get(b"1")) == (2, 0, "山水")
    pairs.close()


def test_txn_abort_rolls_back_deletes(tmp_path):
    """Deletes are staged per-transaction: an aborted txn's deletes vanish,
    are invisible to other txns before commit, and a later unrelated
    commit must not drop the key (regression: deletes used to mutate the
    shared environment immediately)."""
    env = L.open(str(tmp_path / "e"))
    with env.begin(write=True) as t:
        t.put(b"k", b"v")
    txn = env.begin(write=True)
    assert txn.delete(b"k") is True
    assert txn.get(b"k") is None          # visible inside the txn
    assert env.begin().get(b"k") == b"v"  # invisible outside
    txn.abort()
    assert env.begin().get(b"k") == b"v"
    with env.begin(write=True) as t2:     # unrelated commit keeps the key
        t2.put(b"other", b"x")
    assert env.begin().get(b"k") == b"v"
    t3 = env.begin(write=True)            # delete-then-put in one txn
    t3.delete(b"k")
    assert t3.get(b"k") is None
    t3.put(b"k", b"v2")
    assert t3.stat()["entries"] == 2
    t3.commit()
    assert env.begin().get(b"k") == b"v2"
    env.close()


def test_reader_nondefault_page_size(tmp_path):
    """Files written by liblmdb on 16K-page hosts put meta page 1 at the
    REAL page size, not the 4K default; the reader must locate it via meta
    0's recorded psize (regression: it probed byte 4096 and silently fell
    back to the stale meta 0)."""
    import struct

    psize = 16384
    buf = bytearray(psize * 3)
    items = [(b"alpha", b"A" * 10), (b"beta", b"B" * 20)]
    base = 2 * psize  # leaf page, pgno 2
    off, ptrs = psize, []
    for k, v in items:
        nb = L._NODEHDR.pack(len(v) & 0xFFFF, len(v) >> 16, 0, len(k)) + k + v
        off -= L._even(len(nb))
        buf[base + off:base + off + len(nb)] = nb
        ptrs.append(off)
    lower = L.PAGEHDRSZ + 2 * len(ptrs)
    L._PAGEHDR.pack_into(buf, base, 2, 0, L.P_LEAF, lower, off)
    struct.pack_into(f"<{len(ptrs)}H", buf, base + L.PAGEHDRSZ, *ptrs)

    def meta(pgno, txnid, root, entries, leaf_pages, depth):
        o = pgno * psize
        L._PAGEHDR.pack_into(buf, o, pgno, 0, L.P_META, 0, 0)
        o += L.PAGEHDRSZ
        L._META_HEAD.pack_into(buf, o, L.MDB_MAGIC, L.MDB_VERSION, 0,
                               psize * 3)
        L._DB.pack_into(buf, o + L._META_HEAD.size,        # free DB: pad
                        psize, 0, 0, 0, 0, 0, 0, L.P_INVALID)  # = psize
        L._DB.pack_into(buf, o + L._META_HEAD.size + L._DB.size,
                        0, 0, depth, 0, leaf_pages, 0, entries, root)
        L._META_TAIL.pack_into(buf, o + L._META_HEAD.size + 2 * L._DB.size,
                               2, txnid)

    meta(0, 1, L.P_INVALID, 0, 0, 0)  # stale empty snapshot
    meta(1, 2, 2, 2, 1, 1)            # live snapshot -> leaf pgno 2
    d = tmp_path / "big16k"
    d.mkdir()
    (d / "data.mdb").write_bytes(bytes(buf))

    r = L.LMDBReader(str(d))
    assert r.psize == psize
    assert r.entries == 2
    assert r.get(b"alpha") == b"A" * 10
    assert r.get(b"beta") == b"B" * 20
    assert r.get(b"gamma") is None
    r.close()


def test_commit_flushes_are_amortized(tmp_path, monkeypatch):
    """Periodic commits (the reference ingests with a commit every 1000-5000
    puts) must not rewrite the whole file each time: flushes follow a
    size-doubling schedule, with sync()/close() completing the file."""
    calls = []
    real = L.write_lmdb
    monkeypatch.setattr(L, "write_lmdb",
                        lambda *a, **kw: (calls.append(1), real(*a, **kw)))
    env = L.open(str(tmp_path / "e"))
    for c in range(10):                      # 10 commits x 100 records
        with env.begin(write=True) as t:
            for i in range(100):
                t.put(f"{c:03d}-{i:03d}".encode(), b"v" * 50)
    mid_flushes = len(calls)
    assert mid_flushes <= 5, mid_flushes     # ~log2(1000), not 10
    env.close()                              # final flush completes the file
    r = L.LMDBReader(str(tmp_path / "e"))
    assert r.entries == 1000
    assert r.get(b"009-099") == b"v" * 50
    r.close()
