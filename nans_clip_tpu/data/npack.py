"""npack: the framework's record store (native reader + pure-Python writer).

TPU-native replacement for the reference's LMDB envs
(training/data.py:49-56, preprocess/build_lmdb_dataset.py): a memory-mapped
pack file with a sorted u64-key index, read zero-copy through a C++ library
(csrc/npack.cpp) that also provides a threaded libjpeg decode+resize pool.
A pure-Python mmap reader is the fallback when the native lib can't build.

Same dataset structure as the reference: an ``imgs`` pack (image_id ->
JPEG bytes) and a ``pairs`` pack (index -> (image_id, text_id, raw_text)).
"""

from __future__ import annotations

import ctypes
import mmap
import os
import struct
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

MAGIC = b"NSPK1\x00\x00\x00"
_HEADER = struct.Struct("<8sQQ")
_ENTRY = struct.Struct("<QQQ")

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libnpack.so")
_lib = None
_lib_tried = False


def _build_native(out_path: str = _LIB_PATH) -> bool:
    """Compile to a temp file and os.rename into place: rebuilding the
    .so IN PLACE would rewrite pages mapped by other live processes
    (SIGBUS in a running daemon) and race concurrent process starts into
    CDLL-ing a half-written file; rename swaps the directory entry
    atomically while old inodes stay mapped."""
    src = os.path.join(_CSRC, "npack.cpp")
    tmp = f"{out_path}.build.{os.getpid()}"
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp,
                        "-ljpeg", "-pthread"], check=True, capture_output=True)
        os.replace(tmp, out_path)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _lib_stale() -> bool:
    try:
        return (os.path.getmtime(os.path.join(_CSRC, "npack.cpp"))
                > os.path.getmtime(_LIB_PATH))
    except OSError:
        return True


def _declare_base(lib: ctypes.CDLL) -> None:
    """restype/argtypes for the pre-r4 entry points (one copy: the main
    and the side-path loads must not drift)."""
    lib.npack_open.restype = ctypes.c_void_p
    lib.npack_open.argtypes = [ctypes.c_char_p]
    lib.npack_close.argtypes = [ctypes.c_void_p]
    lib.npack_count.restype = ctypes.c_uint64
    lib.npack_count.argtypes = [ctypes.c_void_p]
    lib.npack_get.restype = ctypes.c_int
    lib.npack_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                              ctypes.POINTER(ctypes.c_void_p),
                              ctypes.POINTER(ctypes.c_uint64)]
    lib.npack_get_at.restype = ctypes.c_int
    lib.npack_get_at.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                 ctypes.POINTER(ctypes.c_uint64),
                                 ctypes.POINTER(ctypes.c_void_p),
                                 ctypes.POINTER(ctypes.c_uint64)]
    lib.npack_decode_jpeg_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use, rebuilding when csrc is newer) the
    native npack library, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if (not os.path.exists(_LIB_PATH) or _lib_stale()) and not _build_native():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    _declare_base(lib)
    if not hasattr(lib, "npack_decode_jpeg_pil"):
        # pre-r4 .so with a FRESH mtime (the stale check above catches the
        # normal case before anything is dlopen'd). Re-CDLL of the SAME
        # path would return the already-loaded handle (glibc caches by
        # path), so build to a side path and load THAT; on failure keep
        # the old lib (its entry points still work) and let the r4
        # wrappers fall back to PIL via their own hasattr checks.
        side = _LIB_PATH + ".r4"
        if _build_native(side):
            try:
                side_lib = ctypes.CDLL(side)
                _declare_base(side_lib)
                lib = side_lib
            except Exception:
                pass  # old lib stays usable for its own surface
    if hasattr(lib, "npack_decode_jpeg_pil"):
        lib.npack_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.npack_decode_jpeg_pil.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
        lib.npack_decode_jpeg_batch_pil.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def resize_bicubic(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """PIL-bit-exact bicubic resize of a [H, W, 3] uint8 array (the eval
    transform's Image.BICUBIC semantics) through the native kernel; PIL
    fallback when the library can't build."""
    lib = get_native_lib()
    arr = np.ascontiguousarray(arr, np.uint8)
    assert arr.ndim == 3 and arr.shape[2] == 3, arr.shape
    if lib is None or not hasattr(lib, "npack_resize_bicubic"):
        from PIL import Image
        img = Image.fromarray(arr).resize((out_w, out_h), Image.BICUBIC)
        return np.asarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.npack_resize_bicubic(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.shape[0], arr.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w)
    return out


def decode_jpeg_pil_batch(buffers, size: int, num_threads: int = 4,
                          dct_scale: bool = False) -> Tuple[np.ndarray,
                                                            np.ndarray]:
    """Threaded full decode + PIL-exact bicubic square resize from raw JPEG
    byte strings: (out [N, size, size, 3] u8, ok [N] u8). The serving
    daemon's fast image path (the reference pays PIL for the same work,
    training/data.py:110-111). Failed/unsupported records (corrupt data,
    CMYK sources) get ok=0 so callers can fall back to PIL per image.

    ``dct_scale`` opts into libjpeg 1/1..1/8 DCT scaling before the bicubic
    pass (PIL draft-mode analog) — near-free downscale of large sources,
    NOT bit-exact with the eval transform (measured feature-level drift in
    tests/test_native_decode.py)."""
    lib = get_native_lib()
    n = len(buffers)
    out = np.zeros((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    if n == 0:
        return out, ok
    if lib is None or not hasattr(lib, "npack_decode_jpeg_pil"):
        import io as _io

        from PIL import Image
        for i, b in enumerate(buffers):
            try:
                img = Image.open(_io.BytesIO(b))
                if dct_scale:
                    img.draft("RGB", (size, size))
                img = img.resize((size, size), Image.BICUBIC).convert("RGB")
                out[i] = np.asarray(img, np.uint8)
                ok[i] = 1
            except Exception:
                pass
        return out, ok
    bufs = [bytes(b) for b in buffers]
    datas = (ctypes.c_char_p * n)(*bufs)
    lens = (ctypes.c_uint64 * n)(*[len(b) for b in bufs])
    lib.npack_decode_jpeg_pil(
        datas, lens, n, size, size, num_threads, int(dct_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, ok


class NPackWriter:
    """Streaming writer; records may arrive in any key order."""

    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "wb")
        self.f.write(_HEADER.pack(MAGIC, 0, 0))
        self.entries = []
        self.offset = _HEADER.size

    def put(self, key: int, value: bytes):
        self.f.write(value)
        self.entries.append((int(key), self.offset, len(value)))
        self.offset += len(value)

    def close(self):
        self.entries.sort(key=lambda e: e[0])
        # duplicate keys would make the C binary search and numpy
        # searchsorted resolve the same key to DIFFERENT records
        # (backend-dependent data) — reject at build time
        for a, b in zip(self.entries, self.entries[1:]):
            if a[0] == b[0]:
                raise ValueError(f"duplicate key {a[0]} in npack")
        # pad the index to 8-byte alignment so the native reader's
        # IndexEntry loads are aligned (it rejects unaligned offsets)
        pad = (-self.offset) % 8
        if pad:
            self.f.write(b"\0" * pad)
        index_offset = self.offset + pad
        for key, off, length in self.entries:
            self.f.write(_ENTRY.pack(key, off, length))
        self.f.seek(0)
        self.f.write(_HEADER.pack(MAGIC, len(self.entries), index_offset))
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class NPackReader:
    """Reads a pack; native C++ fast path with pure-Python mmap fallback."""

    def __init__(self, path: str, native: bool = True):
        self.path = path
        self._lib = get_native_lib() if native else None
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.npack_open(path.encode())
            if not self._handle:
                self._lib = None
        # Python mmap view (used by fallback paths and for raw bytes)
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        magic, count, index_offset = _HEADER.unpack_from(self._mm, 0)
        if magic != MAGIC:
            raise ValueError(f"{path}: not an npack file")
        self.count = count
        self._index_offset = index_offset
        if index_offset + 24 * count > len(self._mm):
            raise ValueError(f"{path}: truncated npack (index past EOF)")
        # a VIEW over the mmap (held for the reader's lifetime): copying a
        # 100M-record index would pin gigabytes per reader for no benefit
        idx = np.frombuffer(self._mm, dtype=np.uint64,
                            count=3 * count, offset=index_offset).reshape(count, 3)
        self._keys = idx[:, 0]
        self._offsets = idx[:, 1]
        self._lengths = idx[:, 2]

    def __len__(self) -> int:
        return self.count

    def keys(self) -> np.ndarray:
        return self._keys

    def get(self, key: int) -> Optional[bytes]:
        i = int(np.searchsorted(self._keys, np.uint64(key)))
        if i >= self.count or self._keys[i] != np.uint64(key):
            return None
        off, ln = int(self._offsets[i]), int(self._lengths[i])
        return self._mm[off:off + ln]

    def get_at(self, i: int) -> Tuple[int, bytes]:
        off, ln = int(self._offsets[i]), int(self._lengths[i])
        return int(self._keys[i]), self._mm[off:off + ln]

    def __iter__(self) -> Iterator[Tuple[int, bytes]]:
        for i in range(self.count):
            yield self.get_at(i)

    def decode_jpeg_batch(self, keys: np.ndarray, size: int,
                          num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
        """Decode JPEGs for ``keys`` -> ([N, size, size, 3] u8, ok flags)."""
        keys = np.ascontiguousarray(keys, np.uint64)
        n = len(keys)
        out = np.empty((n, size, size, 3), np.uint8)
        ok = np.empty((n,), np.uint8)
        if self._lib is not None and self._handle:
            self._lib.npack_decode_jpeg_batch(
                self._handle,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
                size, size, num_threads,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return out, ok.astype(bool)
        # PIL fallback
        from PIL import Image
        import io
        for i, key in enumerate(keys):
            raw = self.get(int(key))
            if raw is None:
                out[i] = 0
                ok[i] = 0
                continue
            try:
                img = Image.open(io.BytesIO(raw)).convert("RGB").resize(
                    (size, size), Image.BILINEAR)
                out[i] = np.asarray(img)
                ok[i] = 1
            except Exception:
                out[i] = 0
                ok[i] = 0
        return out, ok.astype(bool)

    def decode_jpeg_batch_pil(self, keys: np.ndarray, size: int,
                              num_threads: int = 8) -> Tuple[np.ndarray,
                                                             np.ndarray]:
        """Decode JPEGs for ``keys`` with the PIL-BIT-EXACT full-decode +
        bicubic path (r4): the eval-transform semantics at native speed.
        Missing keys come back ok=0 (zero image) like decode_jpeg_batch;
        the training loader keeps ``decode_jpeg_batch`` (DCT-scaled +
        bilinear — faster, loader semantics). The C entry reads the
        pack's mmap directly (no per-key Python copies)."""
        lib = get_native_lib()
        if (lib is not None and self._handle
                and hasattr(lib, "npack_decode_jpeg_batch_pil")):
            keys = np.ascontiguousarray(keys, np.uint64)
            n = len(keys)
            out = np.empty((n, size, size, 3), np.uint8)
            ok = np.empty((n,), np.uint8)
            lib.npack_decode_jpeg_batch_pil(
                self._handle,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
                size, size, num_threads, 0,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return out, ok.astype(bool)
        bufs = [self.get(int(k)) or b"" for k in np.asarray(keys).tolist()]
        out, ok = decode_jpeg_pil_batch(bufs, size, num_threads)
        return out, ok.astype(bool)

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.npack_close(self._handle)
            self._handle = None
        # the index arrays are views over the mmap — drop them first or
        # mmap.close() raises BufferError("exported pointers exist")
        self._keys = self._offsets = self._lengths = None
        try:
            self._mm.close()
        except BufferError:
            # a caller still holds a view/slice of the index: leave the
            # map alive (it is freed when the last view dies); the fd can
            # close now — the mapping keeps its own reference
            pass
        self._f.close()


# -- pair record codec -------------------------------------------------------

_PAIR = struct.Struct("<qq")


def encode_pair(image_id: int, text_id: int, raw_text: str) -> bytes:
    return _PAIR.pack(image_id, text_id) + raw_text.encode("utf-8")


def decode_pair(raw: bytes) -> Tuple[int, int, str]:
    image_id, text_id = _PAIR.unpack_from(raw, 0)
    return image_id, text_id, raw[_PAIR.size:].decode("utf-8")
