"""Pallas fused scan kernels (TPU Mosaic).

Motivation (measured on v5e, 1M x 384, B=256): the XLA exact path costs
~26 ms/batch, of which ~20 ms is TopK reading the materialized (B, C) score
matrix back from HBM (1 GB at B=256). The fix is to never materialize the
scores: this module's Phase-1 kernel fuses

    cosine matmul (MXU) -> per-row 1/norm scale -> validity mask ->
    max-reduce over SUBTILE-row groups (VPU)

so only (B, C/SUBTILE) subtile maxima leave the compute path — 32x less HBM
traffic than the score matrix.

Exact top-k then proceeds in two cheap phases:
  Phase 2: top-(k + margin) over subtile maxima (small tensor).
  Phase 3: gather the winning subtiles' rows (chunked over queries so the
           gather stays tens of MB), rescore exactly (float32 HIGHEST),
           final top-k.

Exactness argument: if row r is among the true top-k, its subtile's max is
>= score(r) >= (k-th best score); at most k-1 subtiles can have maxima
strictly greater (each such max is itself a top-k row's score), so r's
subtile always ranks within the top-k subtile maxima. The extra `margin`
absorbs Phase-1 precision wobble (Phase-3 rescoring is authoritative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASKED_SCORE = np.float32(-3.0e38)

SUBTILE = 32  # rows per max-reduce group
_PHASE3_CHUNK = 64  # queries per phase-3 gather step


def _row_tile(d: int, c: int | None = None) -> int:
    """Rows per grid step, sized so one buffer block stays ~<=2 MB of VMEM
    (double buffering + q + outputs must fit in ~16 MB). Always a multiple
    of 256 so the output block keeps whole sublanes. With `c` (total rows —
    a power of two, or a 2^21-multiple above the linear bucket tier), the
    tile is clamped to c so small per-shard buffers (mesh-sharded corpora)
    stay eligible."""
    tile = 256
    for t in (4096, 2048, 1024, 512):
        if t * d * 4 <= (2 << 20):
            tile = t
            break
    if c is not None:
        tile = min(tile, c)
    return tile
def _phase1_kernel_int8(*refs, has_mask):
    """Int8 variant of the phase-1 kernel: int8 x int8 matmul with int32
    accumulation on the MXU (4x the f32 arithmetic rate and a quarter of
    the HBM traffic), then the f32 1/||int8 row|| scale. Drop-in for the
    usearch-equivalent engine's scan."""
    if has_mask:
        q_ref, buf_ref, inv_ref, qinv_ref, mask_ref, count_ref, out_ref = refs
    else:
        q_ref, buf_ref, inv_ref, qinv_ref, count_ref, out_ref = refs
        mask_ref = None
    i = pl.program_id(0)
    q = q_ref[:]  # (B, d) int8 (pre-quantized query)
    tile = buf_ref[:]  # (row_tile, d) int8
    inv = inv_ref[:]  # (row_tile, 1) f32 = 1/||int8 row||
    qinv = qinv_ref[:]  # (1, B) f32 = 1/||int8 query||
    count = count_ref[0]
    row_tile = tile.shape[0]

    dots = jax.lax.dot_general(
        tile,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (row_tile, B) int32
    scores = dots.astype(jnp.float32) * inv * qinv
    row_base = i * row_tile
    gids = row_base + jax.lax.broadcasted_iota(jnp.int32, (row_tile, 1), 0)
    valid = gids < count
    if mask_ref is not None:
        valid = jnp.logical_and(valid, mask_ref[:] > 0)
    scores = jnp.where(valid, scores, _MASKED_SCORE)
    b = scores.shape[1]
    grouped = scores.reshape(row_tile // SUBTILE, SUBTILE, b)
    out_ref[:] = jnp.max(grouped, axis=1)


def _phase1_kernel(*refs, has_mask):
    """One grid step: (row_tile, B) scores -> (row_tile/SUBTILE, B) maxima.

    Row-major orientation: the subtile grouping splits the MAJOR (sublane)
    axis, which Mosaic supports (minor-dim reshapes do not lower).
    """
    if has_mask:
        q_ref, buf_ref, inv_ref, mask_ref, count_ref, out_ref = refs
    else:
        q_ref, buf_ref, inv_ref, count_ref, out_ref = refs
        mask_ref = None
    i = pl.program_id(0)
    q = q_ref[:]  # (B, d)
    tile = buf_ref[:]  # (row_tile, d)
    inv = inv_ref[:]  # (row_tile, 1)
    count = count_ref[0]
    row_tile = tile.shape[0]

    scores = jax.lax.dot_general(
        tile,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (row_tile, B)
    scores = scores * inv
    row_base = i * row_tile
    gids = row_base + jax.lax.broadcasted_iota(jnp.int32, (row_tile, 1), 0)
    valid = gids < count
    if mask_ref is not None:
        valid = jnp.logical_and(valid, mask_ref[:] > 0)
    scores = jnp.where(valid, scores, _MASKED_SCORE)
    b = scores.shape[1]
    grouped = scores.reshape(row_tile // SUBTILE, SUBTILE, b)
    out_ref[:] = jnp.max(grouped, axis=1)


def subtile_maxima(buf, inv_norms, q, count, mask=None):
    """Pallas phase 1. buf (C, d) f32/bf16 with C % row_tile == 0;
    q (B, d) matching buf dtype, B % 8 == 0; mask optional (C,) f32 in {0,1}.
    Returns (C/SUBTILE, B) f32."""
    c, d = buf.shape
    b = q.shape[0]
    row_tile = _row_tile(d, c)
    assert c % row_tile == 0, (c, row_tile)
    tiles = c // row_tile
    out_rows = row_tile // SUBTILE
    has_mask = mask is not None
    in_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, buf, inv_norms.reshape(c, 1)]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask.reshape(c, 1).astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(jnp.asarray([count], jnp.int32))
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (out_rows, b), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    # interpret mode lets the kernel run (slowly) on the CPU backend so the
    # unit suite exercises this path without a TPU.
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_phase1_kernel, has_mask=has_mask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c // SUBTILE, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * d,
            bytes_accessed=c * d * buf.dtype.itemsize + 4 * b * (c // SUBTILE),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _subtile_maxima_int8(buf_i8, inv_norms_i8, qi, q_inv, count, mask=None):
    """Int8 phase 1: buf_i8 (C, d) int8; qi (B, d) int8; q_inv (B,) f32.
    Returns (C/SUBTILE, B) f32 subtile maxima of int8-cosine scores."""
    c, d = buf_i8.shape
    b = qi.shape[0]
    row_tile = _row_tile(d, c)
    assert c % row_tile == 0, (c, row_tile)
    tiles = c // row_tile
    out_rows = row_tile // SUBTILE
    has_mask = mask is not None
    in_specs = [
        pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qi, buf_i8, inv_norms_i8.reshape(c, 1), q_inv.reshape(1, b)]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask.reshape(c, 1).astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(jnp.asarray([count], jnp.int32))
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (out_rows, b), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_phase1_kernel_int8, has_mask=has_mask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c // SUBTILE, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * d,
            bytes_accessed=c * d + 4 * b * (c // SUBTILE),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


_SUPER = 32  # subtiles per supertile (1024 rows) for two-level phase 2


def _phase2_topk_subtiles(maxima, n_sub):
    """Select the top-n_sub subtiles from (bp, n_subtiles) maxima.

    Direct lax.top_k over C/32 maxima is the measured bottleneck at corpus
    scale (1M rows -> 32768 per query: ~5-7 ms of an ~8-16 ms scan on v5e).
    Two-level EXACT reduction: max-reduce groups of 32 subtiles into
    supertile maxima, top-n_sub over C/1024 supertiles, then top-n_sub over
    the selected supertiles' 32*n_sub subtile maxima. Exactness: a top-n_sub
    subtile's supertile always ranks in the top n_sub supertiles (at most
    n_sub-1 supertiles can hold a strictly greater subtile max).
    """
    bp, ns = maxima.shape
    nsup = ns // _SUPER
    if ns % _SUPER or n_sub >= nsup or nsup < 4:
        _, sub_idx = jax.lax.top_k(maxima, n_sub)
        return sub_idx
    grouped = maxima.reshape(bp, nsup, _SUPER)
    sup = jnp.max(grouped, axis=-1)
    _, sup_idx = jax.lax.top_k(sup, n_sub)  # (bp, n_sub) supertiles
    gathered = jnp.take_along_axis(grouped, sup_idx[..., None], axis=1)
    base = sup_idx[..., None] * _SUPER + jnp.arange(_SUPER)[None, None, :]
    _, pos = jax.lax.top_k(gathered.reshape(bp, n_sub * _SUPER), n_sub)
    return jnp.take_along_axis(
        base.reshape(bp, n_sub * _SUPER), pos, axis=-1
    )


@functools.partial(jax.jit, static_argnames=("k", "margin"))
def pallas_scan_topk_int8(buf_i8, inv_norms_i8, q, count, k, mask=None,
                          margin: int | None = None):
    """Int8 fused scan + top-k (the usearch-equivalent metric) via the
    two-phase subtile-max scheme. Scores are int8-cosine similarities —
    identical to ops/scan.py:scan_topk_int8, so phase 3's int8 rescore is
    authoritative (no float refine needed)."""
    c, d = buf_i8.shape
    b = q.shape[0]
    bp = max(8, 1 << (b - 1).bit_length())
    qf = q.astype(jnp.float32)
    if bp != b:
        qf = jnp.pad(qf, ((0, bp - b), (0, 0)))
    qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-30) / 127.0
    qi = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
    q_inv = 1.0 / jnp.maximum(
        jnp.linalg.norm(qi.astype(jnp.float32), axis=-1), 1e-30
    )

    mask_f = None if mask is None else mask.astype(jnp.float32)
    maxima = _subtile_maxima_int8(buf_i8, inv_norms_i8, qi, q_inv, count, mask_f)
    maxima = maxima.T

    if margin is None:
        margin = 16
    n_sub = min(k + margin, c // SUBTILE)
    sub_idx = _phase2_topk_subtiles(maxima, n_sub)

    sub_buf = buf_i8.reshape(c // SUBTILE, SUBTILE, d)
    sub_inv = inv_norms_i8.reshape(c // SUBTILE, SUBTILE)
    sub_mask = None if mask_f is None else mask_f.reshape(c // SUBTILE, SUBTILE)
    kk = min(k, n_sub * SUBTILE)

    def chunk_fn(args):
        qi_chunk, qinv_chunk, sidx_chunk = args
        cand = sub_buf[sidx_chunk]  # (CH, n_sub, SUBTILE, d) int8
        cand_inv = sub_inv[sidx_chunk]
        dots = jnp.einsum(
            "bd,bnsd->bns",
            qi_chunk.astype(jnp.int32),
            cand.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores = dots * cand_inv * qinv_chunk[:, None, None]
        ch = scores.shape[0]
        gids = sidx_chunk[:, :, None] * SUBTILE + jax.lax.broadcasted_iota(
            jnp.int32, (ch, n_sub, SUBTILE), 2
        )
        valid = gids < count
        if sub_mask is not None:
            valid = jnp.logical_and(valid, sub_mask[sidx_chunk] > 0)
        scores = jnp.where(valid, scores, _MASKED_SCORE)
        vals, pos = jax.lax.top_k(scores.reshape(ch, -1), kk)
        idx = jnp.take_along_axis(gids.reshape(ch, -1), pos, axis=-1)
        return vals, idx

    if bp <= _PHASE3_CHUNK:
        vals, idx = chunk_fn((qi, q_inv, sub_idx))
    else:
        n_chunks = bp // _PHASE3_CHUNK
        vals, idx = jax.lax.map(
            chunk_fn,
            (
                qi.reshape(n_chunks, _PHASE3_CHUNK, d),
                q_inv.reshape(n_chunks, _PHASE3_CHUNK),
                sub_idx.reshape(n_chunks, _PHASE3_CHUNK, n_sub),
            ),
        )
        vals = vals.reshape(bp, kk)
        idx = idx.reshape(bp, kk)
    return vals[:b], idx[:b].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "margin"))
def pallas_scan_topk(buf, inv_norms, q, count, k, mask=None,
                     margin: int | None = None, scan_buf=None):
    """Exact fused scan + top-k without materializing (B, C) scores.

    buf: (C, d) float32/bfloat16, C >= 4096 and a multiple of 4096 (a
    power of two, or a 2^21-multiple above the linear bucket tier — see
    ops/scan.py:capacity_bucket — so every row-tile size divides it);
    q: (B, d) float32; count: live rows.
    Returns (values (B, k) f32, indices (B, k) int32), descending.

    scan_buf: optional lower-precision shadow of buf (e.g. bfloat16) used
    ONLY for phase-1 subtile selection ("mixed" mode: phase 1 runs at the
    MXU bf16 rate, ~4x the f32 rate on v5e, and half the HBM traffic);
    phase 3 always gathers + rescores from `buf` at full f32 precision, so
    returned scores are exact and recall is governed by `margin` absorbing
    the shadow's rounding of subtile maxima.
    """
    c, d = buf.shape
    b = q.shape[0]
    bp = max(8, 1 << (b - 1).bit_length())  # pad batch to pow2 >= 8
    qn = q.astype(jnp.float32)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-30)
    if bp != b:
        qn = jnp.pad(qn, ((0, bp - b), (0, 0)))

    p1_buf = buf if scan_buf is None else scan_buf
    mask_f = None if mask is None else mask.astype(jnp.float32)
    maxima = subtile_maxima(p1_buf, inv_norms, qn.astype(p1_buf.dtype), count, mask_f)
    maxima = maxima.T  # (bp, C/SUBTILE)

    if margin is None:
        # default: modest oversampling for float wobble. The bf16-shadow
        # ('mixed') margin was 2*k in round 2, which made the mode SLOWER
        # than exact f32 (phase-3 gather scales with margin); measured at
        # 1M x 384/1024 (16-rep amortized), margin 8 keeps recall@16 at
        # 1.0000 while beating exact by ~15-25% — the margin only needs to
        # absorb bf16 rounding of SUBTILE MAXIMA (<= 2^-8 relative), not
        # re-rank the whole tail
        margin = 8 if scan_buf is not None else 16
    n_sub = min(k + margin, c // SUBTILE)
    sub_idx = _phase2_topk_subtiles(maxima, n_sub)  # (bp, n_sub) subtile ids

    # Phase 3: gather winning subtiles and rescore, in query chunks (a
    # full-batch gather would materialize B*n_sub*SUBTILE*d floats). Always
    # rescores from the full-precision `buf` (authoritative even when
    # phase 1 selected on the bf16 shadow — measured on v5e the bf16
    # GATHER path was far slower than the f32 gather it was meant to
    # halve, so the shadow is phase-1-only).
    sub_buf = buf.reshape(c // SUBTILE, SUBTILE, d)
    sub_inv = inv_norms.reshape(c // SUBTILE, SUBTILE)
    sub_mask = None if mask_f is None else mask_f.reshape(c // SUBTILE, SUBTILE)
    k_wide = min(k, n_sub * SUBTILE)

    def chunk_fn(args):
        q_chunk, sidx_chunk = args  # (CH, d), (CH, n_sub)
        cand = sub_buf[sidx_chunk]  # (CH, n_sub, SUBTILE, d)
        cand_inv = sub_inv[sidx_chunk]
        scores = jnp.einsum(
            "bd,bnsd->bns",
            q_chunk.astype(cand.dtype),
            cand,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST
            if cand.dtype == jnp.float32
            else None,
        )
        scores = scores * cand_inv
        ch = scores.shape[0]
        gids = sidx_chunk[:, :, None] * SUBTILE + jax.lax.broadcasted_iota(
            jnp.int32, (ch, n_sub, SUBTILE), 2
        )
        valid = gids < count
        if sub_mask is not None:
            valid = jnp.logical_and(valid, sub_mask[sidx_chunk] > 0)
        scores = jnp.where(valid, scores, _MASKED_SCORE)
        vals, pos = jax.lax.top_k(scores.reshape(ch, -1), k_wide)
        idx = jnp.take_along_axis(gids.reshape(ch, -1), pos, axis=-1)
        return vals, idx

    if bp <= _PHASE3_CHUNK:
        vals, idx = chunk_fn((qn, sub_idx))
    else:
        n_chunks = bp // _PHASE3_CHUNK
        qc = qn.reshape(n_chunks, _PHASE3_CHUNK, d)
        sc = sub_idx.reshape(n_chunks, _PHASE3_CHUNK, n_sub)
        vals, idx = jax.lax.map(chunk_fn, (qc, sc))
        vals = vals.reshape(bp, k_wide)
        idx = idx.reshape(bp, k_wide)
    return vals[:b], idx[:b].astype(jnp.int32)
