"""ctypes loader for the C++ fast-ops library (native/fastops.cpp).

Build with ``python -m minivectordb_tpu.native.build``; if the shared object
is absent or fails to load, every entry point returns None and callers use
their pure-Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libfastops.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mvdb_hash_ngrams.restype = None
        lib.mvdb_hash_ngrams.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.mvdb_partial_ratio.restype = ctypes.c_int
        lib.mvdb_partial_ratio.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.mvdb_crc32.restype = ctypes.c_uint32
        lib.mvdb_crc32.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.mvdb_wal_append.restype = ctypes.c_int
        lib.mvdb_wal_append.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def hash_ngrams(text: str, n_features: int, nmin: int, nmax: int):
    """Signed char-ngram feature hashing; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = text.encode("utf-8")
    out = np.zeros(n_features, dtype=np.float64)
    lib.mvdb_hash_ngrams(
        data,
        len(data),
        n_features,
        nmin,
        nmax,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def partial_ratio(s1: str, s2: str):
    """0..100 best-window Indel similarity; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
    return int(lib.mvdb_partial_ratio(b1, len(b1), b2, len(b2)))


def crc32(data: bytes):
    """CRC32 of a byte string; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.mvdb_crc32(data, len(data)))


def wal_append(path: str, payload: bytes, fsync: bool = False):
    """Append one CRC-framed record to the WAL file; None if unavailable,
    else True/False for success."""
    lib = _load()
    if lib is None:
        return None
    rc = lib.mvdb_wal_append(path.encode(), payload, len(payload), int(fsync))
    return rc == 0
