"""Device-side hybrid rerank: hash-feature cosine + fuzzy partial-ratio as
ONE jitted program over the candidate batch.

BASELINE.json's north star names this explicitly: "hybrid rerank (text-hash
vectorizer + fuzzy ratio) runs as a batched device kernel over the candidate
set". The host path (rerank/hybrid.py) stays the default at small k (k=6
rerank is microseconds on host); this kernel is the batched path for large
candidate sets (k >= ~32), and the two produce identical rankings (parity
tested against the host implementation on the reference rerank tests).

What runs on device (all VPU integer work, XLA-fused — no HBM pressure):
- murmur3-32 of every char 1..6-gram of every candidate (the sklearn
  HashingVectorizer equivalence, reference vector_database.py:388-393),
  signed-bucketed into 64 features, L2-normalized, cosine vs the query row;
- fuzzy partial_ratio via Hyyro's bit-parallel LCS over every length-m
  window of every candidate simultaneously (m = query length, simulated
  64-bit words as uint32 pairs, jax.lax.population_count for the LCS count);
- the weighted combine (0.80/0.15/0.05, fuzzy unnormalized 0..100 exactly
  like the reference, vector_database.py:424).

Host involvement: lowercasing + UTF-8 byte packing (O(total chars)), and a
per-candidate fallback for the degenerate shapes the bit-parallel form
cannot host (query longer than 64 bytes or than the candidate) — those few
are recomputed with rerank/fuzzy.py and merged before the final sort.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from minivectordb_tpu.rerank.fuzzy import partial_ratio as _host_partial_ratio
from minivectordb_tpu.rerank.hashing import N_FEATURES

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_MIX1 = np.uint32(0x85EBCA6B)
_MIX2 = np.uint32(0xC2B2AE35)
_M5 = np.uint32(5)
_MADD = np.uint32(0xE6546B64)

MAX_QUERY_BYTES = 64  # bit-parallel word width (two uint32 lanes)


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mm3_fixed(b, s: int):
    """murmur3_32 of an s-byte message (s static, 1..6), vectorized.
    b: (..., 6) uint32 array of byte values (entries >= s are ignored)."""
    h = jnp.zeros(b.shape[:-1], jnp.uint32)
    if s >= 4:
        k = (
            b[..., 0]
            | (b[..., 1] << np.uint32(8))
            | (b[..., 2] << np.uint32(16))
            | (b[..., 3] << np.uint32(24))
        )
        k = k * _C1
        k = _rotl(k, 15)
        k = k * _C2
        h = h ^ k
        h = _rotl(h, 13)
        h = h * _M5 + _MADD
        tail0 = 4
        tl = s - 4
    else:
        tail0 = 0
        tl = s
    if tl >= 1:
        k = b[..., tail0]
        if tl >= 2:
            k = k ^ (b[..., tail0 + 1] << np.uint32(8))
        if tl >= 3:
            k = k ^ (b[..., tail0 + 2] << np.uint32(16))
        k = k * _C1
        k = _rotl(k, 15)
        k = k * _C2
        h = h ^ k
    h = h ^ np.uint32(s)
    h = h ^ (h >> np.uint32(16))
    h = h * _MIX1
    h = h ^ (h >> np.uint32(13))
    h = h * _MIX2
    h = h ^ (h >> np.uint32(16))
    return h


def _hash_features_device(byte_arr, lengths):
    """Signed-hash char-ngram features for a byte batch.
    byte_arr: (B, L) uint8 (lowercased UTF-8, zero-padded); lengths: (B,).
    Returns (B, 64) float32, L2-normalized — bit-identical buckets/signs to
    rerank/hashing.py:hash_text_features."""
    b32 = byte_arr.astype(jnp.uint32)
    B, L = byte_arr.shape
    # (B, L, 6): the 6 bytes starting at each position (wrap-safe via pad)
    padded = jnp.pad(b32, ((0, 0), (0, 6)))
    windows = jnp.stack([padded[:, i : i + L] for i in range(6)], axis=-1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    feats = jnp.zeros((B, N_FEATURES), jnp.float32)
    for s in range(1, 7):
        h = _mm3_fixed(windows, s)  # (B, L) uint32
        neg = h >= jnp.uint32(0x80000000)
        # abs(int32 view) % 64 == (two's-complement negation) & 63 for
        # negatives (incl. INT32_MIN), h & 63 otherwise
        idx = jnp.where(neg, (jnp.uint32(0) - h), h) & jnp.uint32(
            N_FEATURES - 1
        )
        sign = jnp.where(neg, -1.0, 1.0).astype(jnp.float32)
        valid = (pos + s) <= lengths[:, None]
        contrib = jnp.where(valid, sign, 0.0)
        onehot = jax.nn.one_hot(idx.astype(jnp.int32), N_FEATURES,
                                dtype=jnp.float32)
        feats = feats + jnp.einsum("bl,blf->bf", contrib, onehot)
    norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats / jnp.maximum(norm, 1e-30)


def _fuzzy_partial_device(cand_bytes, cand_lens, q_len, peq_lo, peq_hi):
    """partial_ratio(query, candidate) for every candidate, bit-parallel.

    cand_bytes: (B, L) uint8; q_len: scalar int32 (1..64);
    peq_lo/peq_hi: (256,) uint32 query char bitmasks (Hyyro's Peq table).
    Only candidates with len >= q_len produce valid results (the returned
    validity mask flags the rest for the host fallback).
    Returns (ratio_0_100 (B,) int32, valid (B,) bool).
    """
    B, L = cand_bytes.shape
    # windows[b, w, j] = cand_bytes[b, w + j], j in [0, 64)
    padded = jnp.pad(cand_bytes, ((0, 0), (0, MAX_QUERY_BYTES)))
    windows = jnp.stack(
        [padded[:, j : j + L] for j in range(MAX_QUERY_BYTES)], axis=-1
    )  # (B, W=L, 64) uint8

    # shift amounts are clamped to < 32 (out-of-range shifts are undefined);
    # the where() picks the all-ones lane for the clamped cases
    lo_amt = jnp.minimum(q_len, 31).astype(jnp.uint32)
    hi_amt = jnp.clip(q_len - 32, 0, 31).astype(jnp.uint32)
    full_lo = jnp.where(
        q_len >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << lo_amt) - jnp.uint32(1),
    )
    full_hi = jnp.where(
        q_len >= 64,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(
            q_len >= 32,
            (jnp.uint32(1) << hi_amt) - jnp.uint32(1),
            jnp.uint32(0),
        ),
    )

    v_lo = jnp.full((B, L), full_lo, jnp.uint32)
    v_hi = jnp.full((B, L), full_hi, jnp.uint32)

    def step(carry, j):
        v_lo, v_hi = carry
        ch = jax.lax.dynamic_index_in_dim(windows, j, axis=2, keepdims=False)
        m_lo = peq_lo[ch.astype(jnp.int32)]
        m_hi = peq_hi[ch.astype(jnp.int32)]
        u_lo = v_lo & m_lo
        u_hi = v_hi & m_hi
        # 64-bit  (v + u)  with carry across the lanes
        a_lo = v_lo + u_lo
        carry_add = (a_lo < v_lo).astype(jnp.uint32)
        a_hi = v_hi + u_hi + carry_add
        # 64-bit  (v - u)  with borrow
        s_lo = v_lo - u_lo
        borrow = (v_lo < u_lo).astype(jnp.uint32)
        s_hi = v_hi - u_hi - borrow
        n_lo = (a_lo | s_lo) & full_lo
        n_hi = (a_hi | s_hi) & full_hi
        # steps past the query length are no-ops
        live = j < q_len
        v_lo = jnp.where(live, n_lo, v_lo)
        v_hi = jnp.where(live, n_hi, v_hi)
        return (v_lo, v_hi), None

    (v_lo, v_hi), _ = jax.lax.scan(
        step, (v_lo, v_hi), jnp.arange(MAX_QUERY_BYTES)
    )
    zeros = jax.lax.population_count(v_lo) + jax.lax.population_count(v_hi)
    lcs = q_len - zeros.astype(jnp.int32)  # (B, W)
    # window w is real iff w + q_len <= candidate length
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    w_valid = (w_idx + q_len) <= cand_lens[:, None]
    best_lcs = jnp.max(jnp.where(w_valid, lcs, -1), axis=1)  # (B,)
    # exact round-half-up in integer math: floor((100*lcs + m/2) / m)
    m_safe = jnp.maximum(q_len, 1)
    ratio = (200 * jnp.maximum(best_lcs, 0) + m_safe) // (2 * m_safe)
    # empty queries go to the host fallback (thefuzz: "" vs "" is 100,
    # "" vs anything else is 0 — not expressible as a window max)
    valid = (cand_lens >= q_len) & (q_len > 0)
    return jnp.where(valid, ratio, 0).astype(jnp.int32), valid


@jax.jit
def _rerank_program(cand_lower, cand_raw, cand_lens, q_lower, q_raw,
                    q_len_hash, q_len_fuzzy, peq_lo, peq_hi, search_scores,
                    weights):
    """The fused device rerank: features + cosine + fuzzy + combine.

    Hashing consumes LOWERCASED bytes (sklearn HashingVectorizer lowercases,
    reference vector_database.py:388-393); the fuzzy ratio consumes RAW bytes
    (thefuzz.partial_ratio does no preprocessing, vector_database.py:410-411).
    """
    all_bytes = jnp.concatenate([q_lower[None, :], cand_lower], axis=0)
    all_lens = jnp.concatenate([q_len_hash[None], cand_lens])
    feats = _hash_features_device(all_bytes, all_lens)
    qv, cv = feats[0], feats[1:]
    hash_scores = cv @ qv  # (B,)
    fuzzy, fuzzy_valid = _fuzzy_partial_device(
        cand_raw, cand_lens, q_len_fuzzy, peq_lo, peq_hi
    )
    combined = (
        weights[0] * search_scores
        + weights[1] * hash_scores
        + weights[2] * fuzzy.astype(jnp.float32)
    )
    return combined, hash_scores, fuzzy, fuzzy_valid


def _pack(texts: list[str], max_len: int,
          lower: bool = True) -> tuple[np.ndarray, np.ndarray]:
    arr = np.zeros((len(texts), max_len), dtype=np.uint8)
    lens = np.zeros(len(texts), dtype=np.int32)
    for i, t in enumerate(texts):
        raw = (t.lower() if lower else t).encode("utf-8")[:max_len]
        arr[i, : len(raw)] = np.frombuffer(raw, dtype=np.uint8)
        lens[i] = len(raw)
    return arr, lens


def _peq(q_bytes: np.ndarray, q_len: int) -> tuple[np.ndarray, np.ndarray]:
    lo = np.zeros(256, dtype=np.uint32)
    hi = np.zeros(256, dtype=np.uint32)
    for i in range(int(q_len)):
        ch = int(q_bytes[i])
        if i < 32:
            lo[ch] |= np.uint32(1) << np.uint32(i)
        else:
            hi[ch] |= np.uint32(1) << np.uint32(i - 32)
    return lo, hi


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


def hybrid_rerank_device(sentences, search_scores, query, k=5,
                         weights=(0.80, 0.15, 0.05)):
    """Device-batched hybrid rerank; same contract as
    rerank/hybrid.py:hybrid_rerank_results."""
    sentences = list(sentences)
    n = len(sentences)
    if n == 0:
        return tuple(), tuple()
    q_bytes_raw = query.encode("utf-8")
    # byte length buckets bound recompiles: one compile per (B, L) bucket
    max_len = _bucket(max(max(len(s.encode("utf-8")) for s in sentences),
                          len(q_bytes_raw), 1), 64)
    b_bucket = _bucket(n)
    cand_lower, _ = _pack(sentences, max_len, lower=True)
    cand_raw, cand_lens = _pack(sentences, max_len, lower=False)
    if n < b_bucket:
        cand_lower = np.pad(cand_lower, ((0, b_bucket - n), (0, 0)))
        cand_raw = np.pad(cand_raw, ((0, b_bucket - n), (0, 0)))
        cand_lens = np.pad(cand_lens, (0, b_bucket - n))
    q_low, _ = _pack([query], max_len, lower=True)
    q_arr, q_lens = _pack([query], max_len, lower=False)
    q_len = int(q_lens[0])
    peq_lo, peq_hi = _peq(q_arr[0], min(q_len, MAX_QUERY_BYTES))
    scores = np.zeros(b_bucket, dtype=np.float32)
    scores[:n] = np.asarray(search_scores, dtype=np.float32)

    combined, hash_scores, fuzzy, fuzzy_valid = _rerank_program(
        jnp.asarray(cand_lower),
        jnp.asarray(cand_raw),
        jnp.asarray(cand_lens),
        jnp.asarray(q_low[0]),
        jnp.asarray(q_arr[0]),
        jnp.int32(q_len),
        jnp.int32(min(q_len, MAX_QUERY_BYTES)),
        jnp.asarray(peq_lo),
        jnp.asarray(peq_hi),
        jnp.asarray(scores),
        jnp.asarray(np.asarray(weights, dtype=np.float32)),
    )
    combined = np.asarray(combined)[:n].astype(np.float64)
    fuzzy_valid = np.asarray(fuzzy_valid)[:n]
    # Shapes the device kernel cannot host exactly fall back PER CANDIDATE:
    # - query > 64 bytes or longer than the candidate (bit-parallel width);
    # - non-ASCII text (the kernel n-grams/windows BYTES; the host contract
    #   n-grams CHARACTERS, reference vector_database.py:388-393 — they
    #   coincide exactly iff every char is one byte).
    q_ascii = q_len == len(query)
    cand_ascii = np.fromiter(
        (cand_lens[i] == len(sentences[i]) for i in range(n)),
        dtype=bool,
        count=n,
    )
    if q_len > MAX_QUERY_BYTES or not q_ascii:
        fuzzy_valid = np.zeros(n, dtype=bool)
    exact = fuzzy_valid & cand_ascii if q_ascii else np.zeros(n, dtype=bool)
    if not exact.all():
        from minivectordb_tpu.rerank.hashing import hash_text_features

        fuzzy_np = np.asarray(fuzzy)[:n].astype(np.float64)
        hash_np = np.asarray(hash_scores)[:n].astype(np.float64)
        qv_host = None
        for i in np.nonzero(~exact)[0]:
            host_f = _host_partial_ratio(query, sentences[i])
            combined[i] += weights[2] * (host_f - fuzzy_np[i])
            if not (q_ascii and cand_ascii[i]):
                if qv_host is None:
                    qv_host = hash_text_features(query)
                host_h = float(qv_host @ hash_text_features(sentences[i]))
                combined[i] += weights[1] * (host_h - hash_np[i])
    order = np.argsort(-combined, kind="stable")
    ranked_sentences = tuple(sentences[i] for i in order)
    ranked_scores = tuple(float(combined[i]) for i in order)
    return ranked_sentences[:k], ranked_scores[:k]
