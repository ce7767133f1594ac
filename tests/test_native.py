"""C++ fastops parity with the pure-Python fallbacks (skipped when the
shared library hasn't been built)."""

import random

import numpy as np
import pytest

from minivectordb_tpu.native import fastops as fastops_loader
from minivectordb_tpu.rerank import fuzzy, hashing

_lib_available = fastops_loader._load() is not None

pytestmark = pytest.mark.skipif(
    not _lib_available,
    reason="libfastops.so not built (python -m minivectordb_tpu.native.build)",
)


def _python_only(fn, *args):
    """Run fn with the native library temporarily disabled."""
    old = fastops_loader._LIB
    fastops_loader._LIB = None
    try:
        return fn(*args)
    finally:
        fastops_loader._LIB = old


def test_hash_ngrams_parity_with_python():
    texts = ["hello world", "wörld — ünïcode ngrams", "a", "", "xy " * 30]
    for t in texts:
        c_vec = fastops_loader.hash_ngrams(t.lower(), 64, 1, 6)
        py_vec = np.zeros(64)
        for g in hashing._char_ngrams(t):
            h = hashing.murmur3_32(g.encode("utf-8"))
            s = h - 0x100000000 if h >= 0x80000000 else h
            py_vec[abs(s) % 64] += 1.0 if s >= 0 else -1.0
        np.testing.assert_allclose(c_vec, py_vec)


def test_partial_ratio_parity_with_python():
    random.seed(42)
    for _ in range(200):
        a = "".join(random.choices("abcdef ", k=random.randint(0, 25)))
        b = "".join(random.choices("abcdef ", k=random.randint(0, 60)))
        assert fastops_loader.partial_ratio(a, b) == _python_only(
            fuzzy.partial_ratio, a, b
        ), (a, b)


def test_partial_ratio_unicode():
    assert fastops_loader.partial_ratio("naïve", "a naïve approach") == 100
    assert fastops_loader.partial_ratio("日本語", "これは日本語です") == 100
