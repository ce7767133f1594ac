"""Device rerank kernel parity vs the host implementation (VERDICT #8 /
BASELINE north star: hash-vectorizer + fuzzy ratio as a batched device
kernel over the candidate set)."""

import random
import string

import numpy as np
import pytest

from minivectordb_tpu.rerank.device import (
    _hash_features_device,
    _pack,
    hybrid_rerank_device,
)
from minivectordb_tpu.rerank.fuzzy import partial_ratio
from minivectordb_tpu.rerank.hashing import hash_text_features
from minivectordb_tpu.rerank.hybrid import hybrid_rerank_results

import jax.numpy as jnp

DOCS = [
    "the quick brown fox jumps",
    "a lazy dog sleeps all day",
    "quantum flux capacitors hum",
    "brown foxes are quick animals",
    "the stock market fell sharply",
    "she plays violin beautifully",
    "i like animals",
    "i like cars",
    "i like programming",
    "technology is the future",
]


def _rand_text(rng, lo=1, hi=60):
    n = rng.randint(lo, hi)
    return "".join(
        rng.choice(string.ascii_letters + string.digits + "  ,.!Ü é")
        for _ in range(n)
    )


def test_device_hash_features_match_host():
    # ASCII-only here: the kernel n-grams bytes, so non-ASCII inputs route
    # through the host per-candidate fallback (covered by the hybrid tests)
    texts = DOCS + ["", "a", "UPPER lower 123 !?", "x" * 200]
    arr, lens = _pack(texts, 256)
    dev = np.asarray(_hash_features_device(jnp.asarray(arr), jnp.asarray(lens)))
    for i, t in enumerate(texts):
        host = hash_text_features(t)
        np.testing.assert_allclose(dev[i], host, rtol=1e-5, atol=1e-6,
                                   err_msg=t)


def test_device_fuzzy_matches_host_partial_ratio():
    rng = random.Random(0)
    queries = ["quick brown fox", "dog", "", "a" * 64, "zzzz not present"]
    for q in queries:
        cands = DOCS + [_rand_text(rng) for _ in range(40)] + [q, q + q]
        scores = [0.5] * len(cands)
        s_dev, v_dev = hybrid_rerank_device(cands, scores, q, k=len(cands))
        s_host, v_host = hybrid_rerank_results(cands, scores, q, k=len(cands), device=False)
        assert list(s_dev) == list(s_host), f"ordering differs for {q!r}"
        np.testing.assert_allclose(v_dev, v_host, rtol=1e-4, atol=1e-4)


def test_device_rerank_reference_flow():
    """The reference rerank test shape (vector_database.py README flow):
    'cars and animals' must surface the car/animal sentences first."""
    sentences = ["i like animals", "i like cars", "i like programming"]
    scores = [0.9, 0.85, 0.8]
    ranked, rscores = hybrid_rerank_device(
        sentences, scores, "cars and animals", k=2
    )
    ranked_h, rscores_h = hybrid_rerank_results(
        sentences, scores, "cars and animals", k=2
    )
    assert list(ranked) == list(ranked_h)
    np.testing.assert_allclose(rscores, rscores_h, rtol=1e-4, atol=1e-4)
    # fuzzy term dominates magnitude exactly like the reference (~0..100*0.05)
    assert rscores[0] > 1.0


def test_device_rerank_long_query_falls_back_per_candidate():
    q = "q" * 100  # > 64 bytes: bit-parallel can't host it; host fuzzy patch
    cands = ["q" * 120, "unrelated text", "q" * 50]
    s_dev, v_dev = hybrid_rerank_device(cands, [0.1, 0.2, 0.3], q, k=3)
    s_host, v_host = hybrid_rerank_results(cands, [0.1, 0.2, 0.3], q, k=3, device=False)
    assert list(s_dev) == list(s_host)
    np.testing.assert_allclose(v_dev, v_host, rtol=1e-4, atol=1e-4)


def test_device_rerank_k128_single_program():
    """VERDICT #8 'Done' shape: 128 candidates reranked in one program."""
    rng = random.Random(1)
    cands = [_rand_text(rng, 5, 120) for _ in range(128)]
    scores = list(np.random.default_rng(0).random(128))
    s_dev, v_dev = hybrid_rerank_device(cands, scores, "brown fox", k=128)
    s_host, v_host = hybrid_rerank_results(cands, scores, "brown fox", k=128, device=False)
    assert list(s_dev) == list(s_host)
    np.testing.assert_allclose(v_dev, v_host, rtol=1e-4, atol=1e-4)


def test_random_fuzz_parity():
    rng = random.Random(7)
    for trial in range(10):
        q = _rand_text(rng, 0, 64)
        cands = [_rand_text(rng, 0, 100) for _ in range(17)]
        scores = [rng.random() for _ in cands]
        s_dev, v_dev = hybrid_rerank_device(cands, scores, q, k=17)
        s_host, v_host = hybrid_rerank_results(cands, scores, q, k=17, device=False)
        np.testing.assert_allclose(
            sorted(v_dev), sorted(v_host), rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial} q={q!r}",
        )
