"""Unit tests for the rerank subsystem (hashing, fuzzy, hybrid, autocut)."""

import numpy as np
import pytest

from minivectordb_tpu.core.engine import autocut_distances, autocut_scores
from minivectordb_tpu.rerank import fuzzy, hashing
from minivectordb_tpu.rerank.hybrid import hybrid_rerank_results


# -- murmur3 reference vectors (public test vectors for MurmurHash3 x86_32) --
def test_murmur3_known_vectors():
    assert hashing.murmur3_32(b"") == 0
    assert hashing.murmur3_32(b"", seed=1) == 0x514E28B7
    assert hashing.murmur3_32(b"hello") == 0x248BFA47
    assert hashing.murmur3_32(b"hello, world", seed=0) == 0x149BBB7F
    assert hashing.murmur3_32(b"The quick brown fox jumps over the lazy dog") == 0x2E4FF723


def test_hash_features_normalized_and_deterministic():
    v1 = hashing.hash_text_features("some example text")
    v2 = hashing.hash_text_features("some example text")
    np.testing.assert_array_equal(v1, v2)
    assert v1.shape == (64,)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-9


def test_hash_scores_favor_similar_text():
    scores = hashing.text_hash_scores(
        "the quick brown fox",
        ["the quick brown fox", "the quick brown cat", "zzzz qqqq xxxx"],
    )
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 0.999


def test_indel_distance_matches_dp_oracle():
    import random

    random.seed(0)

    def dp(s1, s2):
        prev = list(range(len(s2) + 1))
        for c1 in s1:
            cur = [prev[0] + 1]
            for j, c2 in enumerate(s2):
                cur.append(prev[j] if c1 == c2 else min(prev[j + 1], cur[-1]) + 1)
            prev = cur
        return prev[-1]

    alphabet = "abcde"
    for _ in range(200):
        s1 = "".join(random.choices(alphabet, k=random.randint(0, 30)))
        s2 = "".join(random.choices(alphabet, k=random.randint(0, 30)))
        assert fuzzy._indel_distance(s1, s2) == dp(s1, s2), (s1, s2)


def test_partial_ratio_behavior():
    assert fuzzy.partial_ratio("abc", "abc") == 100
    assert fuzzy.partial_ratio("abc", "xxabcxx") == 100  # substring => 100
    assert fuzzy.partial_ratio("", "abc") == 0
    r = fuzzy.partial_ratio("hello world", "hello wrld")
    assert 80 <= r < 100
    # symmetric-ish: shorter slides along longer
    assert fuzzy.partial_ratio("dog", "the dog barks") == 100


def test_hybrid_rerank_orders_by_combined_score():
    sentences = ["match me exactly", "totally different words", "match me exact"]
    search_scores = [0.5, 0.9, 0.5]  # search favors the unrelated one
    ranked, scores = hybrid_rerank_results(
        sentences, search_scores, query="match me exactly", k=3
    )
    # fuzzy 100 * 0.05 = 5.0 dominates the 0.8*0.9 search edge
    assert ranked[0] == "match me exactly"
    assert len(ranked) == 3
    assert scores[0] >= scores[1] >= scores[2]


def test_hybrid_rerank_graceful_fallback():
    # non-string sentences force an exception -> inputs returned trimmed
    sentences = [None, None]
    scores = [0.3, 0.2]
    out_s, out_sc = hybrid_rerank_results(sentences, scores, query="q", k=1)
    assert out_s == [None]
    assert out_sc == [0.3]


def test_autocut_scores_cuts_after_big_drop():
    assert autocut_scores([1.0, 0.95, 0.4, 0.35]) == [2, 3]
    assert autocut_scores([1.0, 0.95, 0.9]) == []


def test_autocut_distances_cuts_after_big_increase():
    assert autocut_distances([0.1, 0.12, 0.5, 0.55]) == [2, 3]
    assert autocut_distances([0.1, 0.11, 0.12]) == []
