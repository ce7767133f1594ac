"""Hybrid reranking: search score + char-ngram hash cosine + fuzzy ratio.

One shared implementation of the reference's ``hybrid_rerank_results``
(vector_database.py:413-441, duplicated into all three database classes).

Semantics preserved:
- combined = 0.80*search + 0.15*text_hash_cosine + 0.05*fuzzy_partial_ratio,
  with the fuzzy term UNNORMALIZED 0..100 exactly as in the reference
  (vector_database.py:424) — so absolute score magnitudes match (README
  examples show scores ~3-4.4).
- any exception degrades gracefully to the truncated inputs
  (vector_database.py:439-441).

Deliberate fix vs. the reference (SURVEY.md C5): the reference stacks
sentences and scores into one numpy string array, so its sort is
LEXICOGRAPHIC on stringified floats and it returns numpy strings
(vector_database.py:427-438). Here the sort is numeric and scores come back
as floats. Orderings agree on the reference's own tests.
"""

from __future__ import annotations

import numpy as np

from minivectordb_tpu.rerank.fuzzy import fuzzy_ratios
from minivectordb_tpu.rerank.hashing import text_hash_scores

DEFAULT_WEIGHTS = (0.80, 0.15, 0.05)

# Candidate counts at or above this route to the fused device kernel
# (rerank/device.py) — at reference scale (k=6) host Python wins on latency;
# at candidate-set scale the batched device program wins (BASELINE north
# star: hash + fuzzy as a batched device kernel over the candidate set).
DEVICE_RERANK_THRESHOLD = 32


def hybrid_rerank_results(
    sentences, search_scores, query, k=5, weights=DEFAULT_WEIGHTS,
    device: bool | None = None,
):
    """device=True forces the fused device kernel, False forces host;
    None (default) routes by candidate count."""
    use_device = (
        device
        if device is not None
        else len(sentences) >= DEVICE_RERANK_THRESHOLD
    )
    if use_device:
        try:
            from minivectordb_tpu.rerank.device import hybrid_rerank_device

            return hybrid_rerank_device(
                sentences, search_scores, query, k=k, weights=weights
            )
        except Exception:
            if device:
                raise
            # fall through to the host path (same graceful-degrade contract
            # as the reference, vector_database.py:439-441)
    try:
        hash_scores = text_hash_scores(query, sentences)
        fuzz_scores = fuzzy_ratios(query, sentences)

        if len(hash_scores) == 0:
            return sentences[:k], search_scores[:k]

        w_search, w_hash, w_fuzzy = weights
        combined = (
            w_search * np.asarray(search_scores, dtype=np.float64)
            + w_hash * np.asarray(hash_scores, dtype=np.float64)
            + w_fuzzy * np.asarray(fuzz_scores, dtype=np.float64)
        )

        order = np.argsort(-combined, kind="stable")
        ranked_sentences = tuple(sentences[i] for i in order)
        ranked_scores = tuple(float(combined[i]) for i in order)
        return ranked_sentences[:k], ranked_scores[:k]
    except Exception:
        return sentences[:k], search_scores[:k]
