"""Adversarial / real-world-shaped fixtures for the LMDB format engine.

VERDICT round-2 item 5: `data/lmdb_store.py` was tested against itself and
the reference's Python stack, but not against the shapes a real `mdb.c`
file contains. These tests build those shapes — a deep (>=3-level) B-tree
at 1e5 keys, MAXKEYSIZE keys, multi-page overflow runs, a file with a
NON-EMPTY free DB (real liblmdb keeps freed pages there; our writer never
produces one, so it is synthesized by patching a written file) — plus a
randomized fuzz roundtrip through the `lmdb`-compat API, and they exercise
the structural verifier (`python -m nans_clip_tpu.data.lmdb_store verify`)
on both healthy and deliberately corrupted files.

Reference usage being protected: training/data.py:49-56 (read path of
published CN-CLIP LMDB datasets), preprocess/build_lmdb_dataset.py:43-95
(write path).
"""

import os
import random
import struct
import subprocess
import sys

import pytest

from nans_clip_tpu.data import lmdb_store as L


def _data_path(p):
    return os.path.join(p, "data.mdb") if os.path.isdir(p) else p


# ---------------------------------------------------------------------------
# deep tree at 1e5 keys
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def deep_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("deep") / "env")
    rs = random.Random(7)
    items = {f"{i:09d}".encode(): rs.randbytes(rs.randint(1, 40))
             for i in range(100_000)}
    L.write_lmdb(root, items)
    return root, items


def test_deep_tree_depth_and_reads(deep_tree):
    root, items = deep_tree
    r = L.LMDBReader(root)
    try:
        assert r.entries == 100_000
        assert r.depth >= 3, f"1e5 keys should need depth>=3, got {r.depth}"
        # point reads across the whole range, including both extremes
        for i in (0, 1, 4_999, 50_000, 99_998, 99_999):
            k = f"{i:09d}".encode()
            assert r.get(k) == items[k]
        assert r.get(b"\x00") is None
        assert r.get(b"~not-there") is None
        # full cursor order == bytewise-sorted order
        keys = [k for k, _ in r.items()]
        assert keys == sorted(items)
    finally:
        r.close()


def test_deep_tree_verifies(deep_tree):
    root, _ = deep_tree
    stats = L.verify(root)
    assert stats["entries"] == 100_000
    assert stats["depth"] >= 3
    assert stats["branch_pages"] > 1
    assert stats["unreferenced_pages"] == 0


# ---------------------------------------------------------------------------
# key-size extremes
# ---------------------------------------------------------------------------

def test_maxkeysize_keys(tmp_path):
    env = str(tmp_path / "maxkey")
    big = {bytes([c]) * L.MAXKEYSIZE: f"v{c}".encode() for c in range(64)}
    big[b"a"] = b"small"
    L.write_lmdb(env, big)
    r = L.LMDBReader(env)
    try:
        for k, v in big.items():
            assert r.get(k) == v
    finally:
        r.close()
    assert L.verify(env)["entries"] == len(big)


def test_oversize_and_empty_keys_rejected(tmp_path):
    env = str(tmp_path / "badkey")
    with pytest.raises(L.LMDBError, match="bad key length"):
        L.write_lmdb(env, {b"x" * (L.MAXKEYSIZE + 1): b"v"})
    with pytest.raises(L.LMDBError, match="bad key length"):
        L.write_lmdb(env, {b"": b"v"})


# ---------------------------------------------------------------------------
# multi-page overflow runs
# ---------------------------------------------------------------------------

def test_multipage_overflow_runs(tmp_path):
    env = str(tmp_path / "overflow")
    rs = random.Random(3)
    items = {
        b"tiny": b"x",
        b"one-page": rs.randbytes(L.PSIZE - L.PAGEHDRSZ),      # exactly 1 page
        b"two-page": rs.randbytes(L.PSIZE - L.PAGEHDRSZ + 1),  # spills to 2
        b"big": rs.randbytes(100_000),                          # 25 pages
        b"huge": rs.randbytes(1_000_000),                       # 245 pages
    }
    L.write_lmdb(env, items)
    r = L.LMDBReader(env)
    try:
        for k, v in items.items():
            assert r.get(k) == v
        assert r.overflow_pages == 1 + 2 + 25 + 245
    finally:
        r.close()
    stats = L.verify(env)
    assert stats["overflow_pages"] == 273


# ---------------------------------------------------------------------------
# non-empty free DB (synthesized: our writer never frees pages, mdb.c does)
# ---------------------------------------------------------------------------

def _graft_free_db(env, n_freed=3):
    """Append a free-DB leaf + ``n_freed`` junk 'freed' pages to a written
    file and patch both meta pages — the shape a real, long-lived liblmdb
    file has after deletes/rewrites."""
    path = _data_path(env)
    with open(path, "rb") as f:
        blob = bytearray(f.read())
    n_pages = len(blob) // L.PSIZE
    free_leaf_pgno = n_pages
    freed = list(range(n_pages + 1, n_pages + 1 + n_freed))

    # free-DB leaf page: one node, key = u64 txnid, data = MDB_IDL
    idl = struct.pack(f"<{n_freed + 1}Q", n_freed, *freed)
    key = struct.pack("<Q", 1)
    node = L._NODEHDR.pack(len(idl) & 0xFFFF, len(idl) >> 16, 0, 8) + key + idl
    page = bytearray(L.PSIZE)
    upper = L.PSIZE - L._even(len(node))
    page[upper:upper + len(node)] = node
    L._PAGEHDR.pack_into(page, 0, free_leaf_pgno, 0, L.P_LEAF,
                         L.PAGEHDRSZ + 2, upper)
    struct.pack_into("<H", page, L.PAGEHDRSZ, upper)
    blob += bytes(page)
    blob += b"\xAA" * (n_freed * L.PSIZE)  # junk freed pages

    # patch both metas: free_db -> (depth 1, 1 leaf, 1 entry, root), last_pg
    for slot_off in (0, L.PSIZE):
        off = slot_off + L.PAGEHDRSZ
        free_db = L._DB.pack(L.PSIZE, 0, 1, 0, 1, 0, 1, free_leaf_pgno)
        blob[off + L._META_HEAD.size:off + L._META_HEAD.size + L._DB.size] = \
            free_db
        tail_off = off + L._META_HEAD.size + 2 * L._DB.size
        _lp, txn = L._META_TAIL.unpack_from(blob, tail_off)
        blob[tail_off:tail_off + L._META_TAIL.size] = \
            L._META_TAIL.pack(n_pages + n_freed, txn)
    with open(path, "wb") as f:
        f.write(blob)
    return freed


def test_nonempty_free_db_read_and_verify(tmp_path):
    env = str(tmp_path / "freedb")
    items = {f"k{i:04d}".encode(): f"v{i}".encode() * 3 for i in range(500)}
    L.write_lmdb(env, items)
    freed = _graft_free_db(env)

    # the reader must be unaffected by free-DB content
    r = L.LMDBReader(env)
    try:
        assert r.entries == 500
        assert r.get(b"k0250") == items[b"k0250"]
        assert dict(r.items()) == items
    finally:
        r.close()

    # and so must the compat API the reference trains through
    e = L.open(env, readonly=True)
    assert e.begin().get(b"k0499") == items[b"k0499"]
    e.close()

    stats = L.verify(env)
    assert stats["freed_pages"] == len(freed)
    assert stats["entries"] == 500


def test_free_db_idl_corruption_detected(tmp_path):
    env = str(tmp_path / "freedb_bad")
    L.write_lmdb(env, {b"k": b"v"})
    _graft_free_db(env)
    path = _data_path(env)
    with open(path, "r+b") as f:
        blob = bytearray(f.read())
        # break the IDL count prefix in the free leaf (3rd page from the end
        # is the free leaf: leaf + 3 junk pages follow it)
        free_leaf_off = len(blob) - 4 * L.PSIZE
        # node body sits at the top of the page; count is the first u64
        # after the 8-byte node header + 8-byte key
        upper = struct.unpack_from("<H", blob, free_leaf_off + L.PAGEHDRSZ)[0]
        struct.pack_into("<Q", blob, free_leaf_off + upper + 8 + 8, 999)
        f.seek(0)
        f.write(blob)
    with pytest.raises(L.LMDBError, match="IDL count"):
        L.verify(env)


# ---------------------------------------------------------------------------
# corruption detection
# ---------------------------------------------------------------------------

def _healthy(tmp_path, name="c", n=2000):
    env = str(tmp_path / name)
    items = {f"key-{i:06d}".encode(): (f"val-{i}" * 5).encode()
             for i in range(n)}
    L.write_lmdb(env, items)
    return env


def test_verify_detects_key_disorder(tmp_path):
    env = _healthy(tmp_path)
    path = _data_path(env)
    r = L.LMDBReader(env)
    # find a leaf page and swap the first two node OFFSETS
    pgno = r.root
    while True:
        page = bytes(r._page(pgno))  # copy: a live view would break close()
        flags, ptrs = r._nodes(page)
        if flags & L.P_LEAF:
            break
        lo, hi, nf, _, _ = r._node(page, ptrs[0])
        pgno = lo | (hi << 16) | (nf << 32)
    r.close()
    with open(path, "r+b") as f:
        blob = bytearray(f.read())
        off = pgno * L.PSIZE + L.PAGEHDRSZ
        a, b = struct.unpack_from("<HH", blob, off)
        struct.pack_into("<HH", blob, off, b, a)
        f.seek(0)
        f.write(blob)
    with pytest.raises(L.LMDBError, match="out of order|below subtree"):
        L.verify(env)


def test_verify_detects_stat_mismatch(tmp_path):
    env = _healthy(tmp_path)
    path = _data_path(env)
    with open(path, "r+b") as f:
        blob = bytearray(f.read())
        for slot_off in (0, L.PSIZE):
            off = slot_off + L.PAGEHDRSZ + L._META_HEAD.size + L._DB.size
            db = list(L._DB.unpack_from(blob, off))
            db[6] += 1  # entries
            blob[off:off + L._DB.size] = L._DB.pack(*db)
        f.seek(0)
        f.write(blob)
    with pytest.raises(L.LMDBError, match="stats mismatch"):
        L.verify(env)


def test_verify_detects_bad_node_offset(tmp_path):
    env = _healthy(tmp_path)
    path = _data_path(env)
    r = L.LMDBReader(env)
    root = r.root
    r.close()
    with open(path, "r+b") as f:
        blob = bytearray(f.read())
        # first node offset of the root page -> past the page end
        struct.pack_into("<H", blob, root * L.PSIZE + L.PAGEHDRSZ, 0xFFF0)
        f.seek(0)
        f.write(blob)
    with pytest.raises(L.LMDBError, match="offset|outside"):
        L.verify(env)


def test_verify_detects_truncated_overflow_run(tmp_path):
    env = str(tmp_path / "ovbad")
    L.write_lmdb(env, {b"big": b"z" * 50_000, b"k": b"v"})
    path = _data_path(env)
    with open(path, "r+b") as f:
        blob = bytearray(f.read())
        # shrink the overflow header's page count (overflow run starts at
        # page 2: writer allocates it for the first big item)
        hp, pad, fl, count = L._OVHDR.unpack_from(blob, 2 * L.PSIZE)
        assert fl & L.P_OVERFLOW
        L._OVHDR.pack_into(blob, 2 * L.PSIZE, hp, pad, fl, count - 3)
        f.seek(0)
        f.write(blob)
    with pytest.raises(L.LMDBError, match="overflow run"):
        L.verify(env)


# ---------------------------------------------------------------------------
# randomized fuzz roundtrip through the compat API
# ---------------------------------------------------------------------------

def test_fuzz_roundtrip_compat_api(tmp_path):
    rs = random.Random(0xC11B)
    env_path = str(tmp_path / "fuzz")
    mirror = {}
    env = L.open(env_path, map_size=64 << 20)
    keyspace = [f"k{i:05d}".encode() for i in range(400)]

    for round_i in range(30):
        txn = env.begin(write=True)
        staged, staged_dels = {}, set()
        for _ in range(rs.randint(1, 60)):
            k = rs.choice(keyspace)
            if rs.random() < 0.25:
                txn.delete(k)
                staged_dels.add(k)
                staged.pop(k, None)
            else:
                v = rs.randbytes(rs.choice([0, 1, 8, 100, 3000, 9000]))
                txn.put(k, v)
                staged[k] = v
                staged_dels.discard(k)
        if rs.random() < 0.2:
            txn.abort()           # everything staged this txn must vanish
        else:
            txn.commit()
            for k in staged_dels:
                mirror.pop(k, None)
            mirror.update(staged)

        if rs.random() < 0.25:    # close + reopen: forces a real file flush
            env.close()
            assert L.verify(env_path)["entries"] == len(mirror)
            env = L.open(env_path, map_size=64 << 20)

        t = env.begin()
        for k in rs.sample(keyspace, 25):
            got = t.get(k)
            assert got == mirror.get(k), f"round {round_i} key {k}"

    env.close()
    # final file: full scan == mirror, and structurally valid
    r = L.LMDBReader(env_path)
    try:
        assert dict(r.items()) == mirror
    finally:
        r.close()
    assert L.verify(env_path)["entries"] == len(mirror)


# ---------------------------------------------------------------------------
# the CLI
# ---------------------------------------------------------------------------

def test_verifier_cli(tmp_path):
    env = _healthy(tmp_path, "cli", n=100)
    ok = subprocess.run(
        [sys.executable, "-m", "nans_clip_tpu.data.lmdb_store", "verify", env],
        capture_output=True, text=True)
    assert ok.returncode == 0, ok.stderr
    import json
    stats = json.loads(ok.stdout)
    assert stats["entries"] == 100

    # corrupt the magic -> exit 1 with FAIL on stderr
    path = _data_path(env)
    with open(path, "r+b") as f:
        blob = bytearray(f.read())
        for slot in (0, L.PSIZE):
            struct.pack_into("<I", blob, slot + L.PAGEHDRSZ, 0xDEADBEEF)
        f.seek(0)
        f.write(blob)
    bad = subprocess.run(
        [sys.executable, "-m", "nans_clip_tpu.data.lmdb_store", "verify", env],
        capture_output=True, text=True)
    assert bad.returncode == 1
    assert "FAIL" in bad.stderr

    usage = subprocess.run(
        [sys.executable, "-m", "nans_clip_tpu.data.lmdb_store"],
        capture_output=True, text=True)
    assert usage.returncode == 2
