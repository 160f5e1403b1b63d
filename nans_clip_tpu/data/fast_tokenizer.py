"""ctypes binding for the C++ WordPiece tokenizer (csrc/tokenizer.cpp).

Drop-in for the hot loader path: ``encode_batch(texts, context_length)``
returns the padded [N, L] int32 matrix with CLS/SEP framing. Exact-parity
with the Python tokenizer (golden-tested); built on first use (the Unicode
tables are generated from this interpreter's unicodedata).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Sequence

import numpy as np

from nans_clip_tpu.tokenizer import DEFAULT_VOCAB

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libnanstok.so")
_lib = None
_lib_tried = False


def _build() -> bool:
    inc = os.path.join(_CSRC, "unicode_tables.inc")
    try:
        if not os.path.exists(inc):
            subprocess.run([sys.executable,
                            os.path.join(_CSRC, "gen_unicode_tables.py"), inc],
                           check=True, capture_output=True)
        subprocess.run(["g++", "-O2", "-shared", "-fPIC",
                        os.path.join(_CSRC, "tokenizer.cpp"), "-o", _LIB_PATH],
                       check=True, capture_output=True, cwd=_CSRC)
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tok_create.restype = ctypes.c_void_p
    lib.tok_create.argtypes = [ctypes.c_char_p]
    lib.tok_destroy.argtypes = [ctypes.c_void_p]
    lib.tok_encode.restype = ctypes.c_int32
    lib.tok_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.tok_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


class FastTokenizer:
    """Native WordPiece tokenizer; raises ImportError if the lib can't build."""

    def __init__(self, vocab_file: str = DEFAULT_VOCAB):
        lib = _get_lib()
        if lib is None:
            raise ImportError("native tokenizer library unavailable")
        self._lib = lib
        self._handle = lib.tok_create(vocab_file.encode())
        if not self._handle:
            raise ImportError(f"failed to load vocab {vocab_file}")

    def encode(self, text: str, max_tokens: int = 512) -> list:
        raw = text.encode("utf-8")
        out = np.empty((max_tokens,), np.int32)
        n = self._lib.tok_encode(self._handle, raw, len(raw),
                                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                                 max_tokens)
        return out[:n].tolist()

    def encode_batch(self, texts: Sequence[str], context_length: int = 52) -> np.ndarray:
        n = len(texts)
        raws = [t.encode("utf-8") for t in texts]
        arr = (ctypes.c_char_p * n)(*raws)
        lens = (ctypes.c_int64 * n)(*[len(r) for r in raws])
        out = np.empty((n, context_length), np.int32)
        self._lib.tok_encode_batch(self._handle, arr, lens, n, context_length,
                                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.tok_destroy(self._handle)
            self._handle = None


def get_fast_tokenizer(vocab_file: str = DEFAULT_VOCAB) -> Optional[FastTokenizer]:
    try:
        return FastTokenizer(vocab_file)
    except ImportError:
        return None
