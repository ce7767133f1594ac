"""Exact-scan search programs (XLA path).

This module is the TPU-native replacement for the reference's FAISS usage:

- ``faiss.IndexFlatIP`` + ``normalize_L2`` + ``index.search``
  (reference vector_database.py:42-47, 495-507) -> one fused jitted program:
  normalize query -> masked cosine matmul -> on-device top-k.
- the reference's "filtered slow path" that builds a throwaway index per query
  (reference vector_database.py:508-523) -> the same program with a boolean
  row mask (masked rows score -inf), no index rebuild ever.
- the usearch int8 cosine index (reference
  sharded_vector_database_usearch.py:616-637) -> the int8-quantized variant.

Design notes (TPU):
- The corpus lives in a padded HBM buffer of power-of-two capacity so that
  every (capacity, dim, k-bucket) combination compiles exactly once; the live
  row count is a runtime scalar, masked via iota < count. No data-dependent
  shapes ever reach XLA.
- Scores are produced by a single dot_general that XLA tiles onto the MXU;
  the per-row 1/norm multiply and validity mask fuse into the matmul epilogue.
- Top-k runs on device in two stages for large corpora (per-tile top-k, then
  top-k of tile winners), which is much faster than a monolithic sort at
  N ~ 1e6; k is bucketed to powers of two to bound recompiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Scores are cosine similarities in [-1, 1]; any value far below is an
# effective -inf that can never win top-k but avoids NaN propagation.
_MASKED_SCORE = np.float32(-3.0e38)



def is_device_array(x) -> bool:
    """True for a device-resident ``jax.Array`` eligible for zero-copy
    passthrough (the public search APIs accept these and never bounce them
    through the host). numpy arrays are excluded explicitly so the
    predicate stays correct on jax versions that register ndarray against
    the Array ABC. This is THE shared passthrough predicate — engine,
    store, and IVF snapshot all route through it so the zero-copy contract
    cannot silently diverge between entry points."""
    return isinstance(x, jax.Array) and not isinstance(x, np.ndarray)


def as_device_queries(x: jax.Array) -> jax.Array:
    """Normalize a device-resident query batch entirely on device:
    float32 dtype, 2-D (batch, dim) shape. No host transfer."""
    q = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
    return q[None, :] if q.ndim == 1 else q


def fetch_results(vals, idx):
    """Materialize a (scores, indices) result pair in ONE host transfer.

    Two sequential ``np.asarray`` calls each block on the device and run
    their own device->host transfer — on a remote-attached device that is
    two link round trips per search. ``jax.device_get`` on the pair batches
    both arrays into a single drain. Host-routed results (already numpy)
    pass through untouched.
    """
    if isinstance(vals, np.ndarray) and isinstance(idx, np.ndarray):
        return vals, idx
    return jax.device_get((vals, idx))


def k_bucket(search_k: int, capacity: int) -> int:
    """Round k up to a power of two (bounds jit cache size)."""
    b = 1
    while b < search_k:
        b <<= 1
    return min(b, capacity)


# Above this row count, capacity buckets step linearly instead of doubling:
# pow2 doubling wastes up to half of HBM exactly where it is scarce (a
# 10M-row corpus would pad to 16.8M rows — 6.4 GB of dead int8 at d=384).
_LINEAR_BUCKET_STEP = 1 << 21


def capacity_bucket(n: int, minimum: int = 1024) -> int:
    """Round a row count up to an HBM buffer capacity bucket.

    Power-of-two up to 2^21 rows, then multiples of 2^21: the overshoot is
    capped at 2^21 rows while the compile cache stays bounded (one program
    per multiple). Every bucket is a multiple of 4096 above that size, so
    the Pallas row tiles (power-of-two, <= 4096) always divide it, and the
    function stays monotone (callers rely on bucket(a) <= bucket(b) for
    a <= b when clamping padded writes to the buffer)."""
    c = minimum
    while c < n and c < _LINEAR_BUCKET_STEP:
        c <<= 1
    if c < n:
        c = -(-n // _LINEAR_BUCKET_STEP) * _LINEAR_BUCKET_STEP
    return c


def _normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, 1e-30)


def topk_last_axis(
    scores: jax.Array, k: int, mode: str = "exact"
) -> tuple[jax.Array, jax.Array]:
    """Top-k along the last axis.

    scores: (..., C). Returns (values, indices) each (..., k), descending.

    mode='exact' uses XLA's native TopK (measured on v5e: a hand-rolled
    tile-then-merge two-stage is ~8x SLOWER than the builtin at 256x1M, so
    no custom staging here). mode='approx' uses the TPU ApproxTopK custom
    call (lax.approx_max_k, recall_target 0.99 per-call) — the right trade
    for recall-tolerant high-QPS serving.
    """
    if mode == "approx" and scores.shape[-1] >= (1 << 14):
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# float32 / bfloat16 cosine scan
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def scan_topk(buf, inv_norms, q, count, k, mask=None, mode="exact"):
    """Fused cosine scan + top-k for a batch of queries.

    buf:       (C, d) float32 or bfloat16 — padded corpus, raw (unnormalized)
    inv_norms: (C,)   float32 — 1/||row||  (0 for zero rows)
    q:         (B, d) float32 — raw queries
    count:     scalar int32 — number of live rows (<= C)
    mask:      optional (C,) bool — candidate rows (filtered search)

    Returns (values (B, k) float32, indices (B, k) int32), descending cosine.
    """
    c = buf.shape[0]
    qn = _normalize(q.astype(jnp.float32)).astype(buf.dtype)
    # (B, d) x (C, d) -> (B, C); MXU matmul with f32 accumulation. HIGHEST
    # precision keeps true float32 multiplies on TPU (the default would drop
    # to bf16 passes and break exact-recall parity with a CPU float32 scan);
    # the scan is HBM-bandwidth-bound, so the extra MXU passes are free.
    scores = jax.lax.dot_general(
        qn,
        buf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if buf.dtype == jnp.float32 else None,
    )
    scores = scores * inv_norms[None, :]
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) < count
    if mask is not None:
        valid = jnp.logical_and(valid, mask[None, :])
    scores = jnp.where(valid, scores, _MASKED_SCORE)
    vals, idx = topk_last_axis(scores, k, mode)
    return vals, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# int8 cosine scan (usearch-equivalent)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "mode"))
def scan_topk_int8(buf_i8, inv_norms_i8, q, count, k, mask=None, mode="exact"):
    """Int8 symmetric-quantized cosine scan + top-k.

    buf_i8:       (C, d) int8 — per-row symmetric-quantized corpus
    inv_norms_i8: (C,) float32 — 1/||int8 row||  (0 for zero rows)
    q:            (B, d) float32

    Cosine of the quantized vectors: (qi . ri) / (||qi|| ||ri||), matching the
    usearch `metric='cos', dtype='i8'` behavior the reference relies on
    (sharded_vector_database_usearch.py:621-627). Returns similarities.
    """
    c = buf_i8.shape[0]
    qf = q.astype(jnp.float32)
    qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-30) / 127.0
    qi = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    q_inv_norm = 1.0 / jnp.maximum(
        jnp.linalg.norm(qi.astype(jnp.float32), axis=-1, keepdims=True), 1e-30
    )
    dots = jax.lax.dot_general(
        qi,
        buf_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    scores = dots * q_inv_norm * inv_norms_i8[None, :]
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) < count
    if mask is not None:
        valid = jnp.logical_and(valid, mask[None, :])
    scores = jnp.where(valid, scores, _MASKED_SCORE)
    vals, idx = topk_last_axis(scores, k, mode)
    return vals, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Incremental device-buffer maintenance
# ---------------------------------------------------------------------------


@jax.jit
def row_inv_norms(rows):
    """1/||row|| per row, 0 for all-zero rows. rows: (n, d) f32 -> (n,) f32."""
    sq = jnp.sum(rows.astype(jnp.float32) ** 2, axis=-1)
    return jnp.where(sq > 0, jax.lax.rsqrt(jnp.maximum(sq, 1e-38)), 0.0)


def _update_rows_impl(buf, inv_norms, rows, start):
    rows = rows.astype(buf.dtype)
    buf = jax.lax.dynamic_update_slice(buf, rows, (start, 0))
    inorm = row_inv_norms(rows.astype(jnp.float32))
    inv_norms = jax.lax.dynamic_update_slice(inv_norms, inorm, (start,))
    return buf, inv_norms


# Write `rows` into buf[start:start+n] in place (donated buffers) — replaces
# the reference's full-index rebuild on every mutation (vector_database.py:
# 42-47): only the changed row range is touched. Donation invalidates the
# input buffer, so callers must use the `_nodonate` variant whenever a live
# search snapshot still references it (see core/store.py:VectorStore.sync).
update_rows = functools.partial(jax.jit, donate_argnums=(0, 1))(_update_rows_impl)
update_rows_nodonate = jax.jit(_update_rows_impl)


# Large host->device transfers go up in bounded slabs: this runtime's
# compile helper has been observed to fail on multi-GB single-copy programs
# (HTTP 500 on the copy-start program), and slabs also bound host staging.
_UPLOAD_SLAB_BYTES = 256 << 20


def upload_slab_rows(d: int, itemsize: int = 4) -> int:
    """Power-of-two rows per bulk-upload slab, sized so one slab transfers
    ~<= _UPLOAD_SLAB_BYTES of the UPLOADED dtype (pass its itemsize:
    quantized uploads move 4x/2x more rows per slab for the same bytes)."""
    slab = max(8, _UPLOAD_SLAB_BYTES // max(d * itemsize, 1))
    return max(8, capacity_bucket(slab, 8) >> 1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_slab(buf, rows, start):
    return jax.lax.dynamic_update_slice(buf, rows.astype(buf.dtype), (start, 0))


def chunked_device_put(host: np.ndarray, dtype=None) -> jax.Array:
    """Upload a (N, d) host array as bounded slabs into a device buffer."""
    n, d = host.shape
    out_dtype = host.dtype if dtype is None else dtype
    row_bytes = d * np.dtype(host.dtype).itemsize
    slab = max(1, _UPLOAD_SLAB_BYTES // max(row_bytes, 1))
    if n <= slab:
        arr = jnp.asarray(host)
        return arr.astype(out_dtype) if arr.dtype != out_dtype else arr
    slab = capacity_bucket(slab, 8) >> 1  # pow2 rows -> one compile per shape
    buf = jnp.zeros((n, d), dtype=out_dtype)
    for start in range(0, n, slab):
        # the final window shifts left to stay in bounds (rewriting a few
        # already-clean rows is harmless)
        write_at = min(start, n - slab)
        piece = np.ascontiguousarray(host[write_at : write_at + slab])
        buf = _write_slab(buf, jnp.asarray(piece), write_at)
    return buf


def _update_rows_cast_impl(buf_lowp, rows, start):
    return jax.lax.dynamic_update_slice(
        buf_lowp, rows.astype(buf_lowp.dtype), (start, 0)
    )


# Write f32 `rows` into a lower-precision shadow buffer in place (the 'mixed'
# mode's bfloat16 phase-1 shadow). Same donation caveat as update_rows.
update_rows_cast = functools.partial(jax.jit, donate_argnums=(0,))(
    _update_rows_cast_impl
)
update_rows_cast_nodonate = jax.jit(_update_rows_cast_impl)


def _update_rows_int8_impl(buf_i8, inv_norms_i8, rows, start):
    rmax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True)
    rscale = jnp.maximum(rmax, 1e-30) / 127.0
    ri = jnp.clip(jnp.round(rows / rscale), -127, 127).astype(jnp.int8)
    buf_i8 = jax.lax.dynamic_update_slice(buf_i8, ri, (start, 0))
    inorm = row_inv_norms(ri.astype(jnp.float32))
    inv_norms_i8 = jax.lax.dynamic_update_slice(inv_norms_i8, inorm, (start,))
    return buf_i8, inv_norms_i8


# Quantize `rows` (f32) to int8 and write in place at `start`. Same donation
# caveat as update_rows.
update_rows_int8 = functools.partial(jax.jit, donate_argnums=(0, 1))(
    _update_rows_int8_impl
)
update_rows_int8_nodonate = jax.jit(_update_rows_int8_impl)


def quantize_rows_int8_host(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side mirror of ``_update_rows_int8_impl``'s per-row symmetric
    127-scale quantization (numpy round is the same round-half-to-even), so
    bulk uploads can send the STORED int8 bytes over the link instead of the
    f32 originals — 4x fewer bytes host->device. Returns (int8 rows,
    f32 1/||int8 row|| inverse norms, 0 for all-zero rows)."""
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    rmax = np.max(np.abs(rows), axis=-1, keepdims=True)
    rscale = np.maximum(rmax, np.float32(1e-30)) / np.float32(127.0)
    ri = np.clip(np.round(rows / rscale), -127, 127).astype(np.int8)
    sq = np.sum(np.square(ri, dtype=np.float32), axis=-1, dtype=np.float32)
    inorm = np.where(
        sq > 0, 1.0 / np.sqrt(np.maximum(sq, np.float32(1e-38))), 0.0
    ).astype(np.float32)
    return ri, inorm


def cast_rows_bf16_host(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side mirror of ``_update_rows_impl`` for a bfloat16 buffer: cast
    the rows to bf16 (halving the link bytes) and compute the inverse norms
    from the bf16-ROUNDED values, exactly as the device update path does
    (it casts first, then norms the cast rows)."""
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    rb = rows.astype(jnp.bfloat16)
    back = rb.astype(np.float32)
    sq = np.sum(np.square(back, dtype=np.float32), axis=-1, dtype=np.float32)
    inorm = np.where(
        sq > 0, 1.0 / np.sqrt(np.maximum(sq, np.float32(1e-38))), 0.0
    ).astype(np.float32)
    return rb, inorm


def _write_rows_pre_impl(buf, inv_norms, rows, inorm, start):
    """Write PRE-quantized rows (dtype already == buf.dtype) and their
    host-computed inverse norms in place — the device does no cast work, so
    the transfer carries exactly the stored bytes."""
    buf = jax.lax.dynamic_update_slice(buf, rows, (start, 0))
    inv_norms = jax.lax.dynamic_update_slice(inv_norms, inorm, (start,))
    return buf, inv_norms


write_rows_pre = functools.partial(jax.jit, donate_argnums=(0, 1))(
    _write_rows_pre_impl
)
write_rows_pre_nodonate = jax.jit(_write_rows_pre_impl)


# -- tombstone-delete support (deferred compaction) ---------------------------
# Deletes mark rows dead instead of compacting the packed matrix eagerly
# (the reference's np.delete, vector_database.py:126, moves the whole tail
# per call). On device the alive mask updates by an O(deleted) index
# scatter; physical compaction is deferred and, when it runs, rearranges the
# HBM buffer with an on-device gather instead of re-streaming the tail
# through the host link.


def _clear_mask_rows_impl(mask, idx):
    return mask.at[idx].set(False)


# never donated: snapshots captured before the delete hold the previous
# alive mask and must keep reading it (a dev_capacity bool array is ~1 MB at
# 1M rows — the copy is noise)
clear_mask_rows_dev = jax.jit(_clear_mask_rows_impl)


def clear_mask_rows(mask: jax.Array, rows: np.ndarray) -> jax.Array:
    """alive_mask.at[rows].set(False) with the index vector padded to a
    power-of-two bucket (one compiled program per bucket, not per delete
    size). Pad slots repeat rows[0] — a duplicate scatter of False is a
    no-op."""
    n = int(rows.shape[0])
    pad = max(8, 1 << (n - 1).bit_length())
    idx = np.full(pad, rows[0], dtype=np.int32)
    idx[:n] = rows
    return clear_mask_rows_dev(mask, jnp.asarray(idx))


def _compact_gather_impl(buf, inv_norms, perm):
    return buf[perm], inv_norms[perm]


compact_gather = functools.partial(jax.jit, donate_argnums=(0, 1))(
    _compact_gather_impl
)
compact_gather_nodonate = jax.jit(_compact_gather_impl)


def _compact_gather_one_impl(buf, perm):
    return buf[perm]


compact_gather_one = functools.partial(jax.jit, donate_argnums=(0,))(
    _compact_gather_one_impl
)
compact_gather_one_nodonate = jax.jit(_compact_gather_one_impl)
