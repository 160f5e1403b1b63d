"""``lmdb`` module shim (tests only): lets the reference's unmodified code
(`import lmdb`) run against our from-scratch LMDB file-format implementation
(nans_clip_tpu/data/lmdb_store.py). Put tests/_shims on sys.path."""

from nans_clip_tpu.data.lmdb_store import (Cursor, Environment, LMDBError,
                                           Transaction, open)

Error = LMDBError

__all__ = ["open", "Environment", "Transaction", "Cursor", "Error"]
