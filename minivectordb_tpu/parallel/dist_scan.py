"""Distributed exact scan: row-partitioned corpus, shard-local top-k,
ICI all-gather merge.

This is the TPU-native replacement for the reference's storage-only sharding
(reference sharded_vector_database.py:98-178 — shard files exist on disk but
search is still one global monolithic scan). Here the packed corpus matrix is
partitioned row-wise across a 1-D device mesh; each chip scans its rows and
produces a local (k scores, k global ids) list; an all-gather over ICI
collects n_devices * k candidates and a final device-side top-k yields the
global answer — the classic distributed exact-kNN recipe (SURVEY.md §2c).

All collectives are XLA collectives inside ``jax.shard_map``; there is no
NCCL/MPI analog to port.

Multi-host pods use a 2-D (dcn, ici) mesh (parallel/mesh.py:pod_mesh) with a
HIERARCHICAL merge: per-chip top-k lists merge over the host's fast ICI
links first, so one k-wide candidate list per host (replicated across its
ICI positions — each ICI column runs the same cross-host all-gather)
crosses the slow DCN, instead of chips_per_host distinct k-wide lists.
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minivectordb_tpu.ops.scan import topk_last_axis
from minivectordb_tpu.parallel.mesh import SHARD_AXIS

_MASKED_SCORE = np.float32(-3.0e38)


def _local_topk(buf, inv_norms, q, count, mask, k, row_base,
                use_pallas=False):
    """Per-device top-k over the local row block (runs under shard_map).

    An int8 ``buf`` runs the usearch-equivalent quantized cosine per shard
    (query symmetric-quantized in-body, int32-accumulated MXU dot — the
    same math as ops/scan.py:scan_topk_int8).

    ``use_pallas`` routes the local scan through the two-phase Pallas
    kernels (ops/pallas_scan.py) — the shard-local analog of the
    single-chip fast path: phase-1 subtile maxima never materialize the
    (B, local_rows) score matrix, so per-chip HBM traffic drops ~32x
    before the collective merge. Returns (values, GLOBAL ids), (B, k)."""
    local_rows = buf.shape[0]
    if use_pallas:
        from minivectordb_tpu.ops.pallas_scan import (
            pallas_scan_topk,
            pallas_scan_topk_int8,
        )

        count_local = jnp.clip(count - row_base, 0, local_rows)
        if buf.dtype == jnp.int8:
            lvals, lidx = pallas_scan_topk_int8(
                buf, inv_norms, q.astype(jnp.float32), count_local, k, mask
            )
        else:
            lvals, lidx = pallas_scan_topk(
                buf, inv_norms, q.astype(jnp.float32), count_local, k, mask
            )
        lgidx = lidx + row_base
    elif buf.dtype == jnp.int8:
        qf = q.astype(jnp.float32)
        qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qscale = jnp.maximum(qmax, 1e-30) / 127.0
        qi = jnp.clip(jnp.round(qf / qscale), -127, 127).astype(jnp.int8)
        q_inv = 1.0 / jnp.maximum(
            jnp.linalg.norm(qi.astype(jnp.float32), axis=-1, keepdims=True),
            1e-30,
        )
        scores = jax.lax.dot_general(
            qi,
            buf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        scores = scores * q_inv * inv_norms[None, :]
    else:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
        scores = jax.lax.dot_general(
            qn.astype(buf.dtype),
            buf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST
            if buf.dtype == jnp.float32
            else None,
        )
        scores = scores * inv_norms[None, :]
    if not use_pallas:
        gids = row_base + jax.lax.broadcasted_iota(
            jnp.int32, (1, local_rows), 1
        )
        valid = gids < count
        if mask is not None:
            valid = jnp.logical_and(valid, mask[None, :])
        scores = jnp.where(valid, scores, _MASKED_SCORE)

        lvals, lidx = topk_last_axis(scores, k)  # (B, k) local
        lgidx = lidx.astype(jnp.int32) + row_base
    return lvals, lgidx


def _gather_merge(lvals, lgidx, axis_name, k_out):
    """All-gather per-shard (values, ids) over `axis_name` and merge-top-k."""
    all_vals = jax.lax.all_gather(lvals, axis_name, axis=0)  # (n, B, k)
    all_idx = jax.lax.all_gather(lgidx, axis_name, axis=0)
    n, b, k = all_vals.shape
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, n * k)
    flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, n * k)
    mvals, mpos = jax.lax.top_k(flat_vals, min(k_out, n * k))
    midx = jnp.take_along_axis(flat_idx, mpos, axis=-1)
    return mvals, midx


def _local_scan_merge(buf, inv_norms, q, count, mask, k, k_final=None,
                      use_pallas=False, axes=(SHARD_AXIS,)):
    """Flat mesh: per-shard top-k + one all-gather merge over the row axes.

    ``k`` is the per-shard candidate count (capped at local rows);
    ``k_final`` is the post-merge width — it may exceed ``k`` (when the
    requested k is larger than a shard) up to n_devices * k, so a small
    corpus spread over many devices still returns min(k, count) results."""
    row_base = jax.lax.axis_index(axes) * buf.shape[0]
    lvals, lgidx = _local_topk(
        buf, inv_norms, q, count, mask, k, row_base, use_pallas
    )
    return _gather_merge(lvals, lgidx, axes, k_final or k)


def _local_scan_merge_pod(buf, inv_norms, q, count, mask, k, k_final=None,
                          use_pallas=False):
    """2-D (dcn, ici) pod mesh: hierarchical merge.

    Per-chip top-k lists first merge over the host's fast ICI links, so a
    single k_final-wide candidate list per host (replicated across that
    host's ICI positions — every ICI column runs the same DCN all-gather)
    then crosses the slow DCN: k_final floats+ids per host per ICI position
    instead of chips_per_host * k distinct lists — the multi-host recipe
    SURVEY.md §5 prescribes."""
    from minivectordb_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS

    row_base = jax.lax.axis_index((DCN_AXIS, ICI_AXIS)) * buf.shape[0]
    lvals, lgidx = _local_topk(
        buf, inv_norms, q, count, mask, k, row_base, use_pallas
    )
    k_out = k_final or k
    hvals, hidx = _gather_merge(lvals, lgidx, ICI_AXIS, k_out)  # intra-host
    return _gather_merge(hvals, hidx, DCN_AXIS, k_out)  # cross-host


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "k_final", "has_mask", "use_pallas"),
)
def _dist_scan(mesh: Mesh, buf, inv_norms, q, count, mask, k, k_final,
               has_mask, use_pallas=False):
    axes = tuple(mesh.axis_names)
    if len(axes) == 2:
        # (dcn, ici) pod mesh -> hierarchical merge (intra-host first)
        fn = functools.partial(
            _local_scan_merge_pod, k=k, k_final=k_final, use_pallas=use_pallas
        )
    else:
        fn = functools.partial(
            _local_scan_merge, k=k, k_final=k_final, use_pallas=use_pallas,
            axes=axes,
        )

    def wrapped(buf, inv_norms, q, count, mask):
        return fn(buf, inv_norms, q, count, mask if has_mask else None)

    specs_in = (
        P(axes, None),  # buf rows (partitioned over ALL mesh axes)
        P(axes),  # inv_norms
        P(),  # q replicated
        P(),  # count
        P(axes) if has_mask else P(),
    )
    return jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=specs_in,
        out_specs=(P(), P()),
        check_vma=False,
    )(buf, inv_norms, q, count, mask)


class DistributedScanIndex:
    """Mesh-sharded packed corpus for multi-chip exact search.

    Host-canonical like core.store.VectorStore, but the device buffer is laid
    out with ``NamedSharding(P('shards', None))`` so XLA keeps each row block
    in its own chip's HBM. (Bulk-load + search oriented; incremental dirty
    tracking stays in the single-chip store.)
    """

    def __init__(self, mesh: Mesh, dim: int, device_dtype: str = "float32",
                 search_impl: str = "auto"):
        """search_impl: 'auto' routes the per-shard scan through the Pallas
        two-phase kernel on TPU when the local shard is large enough (same
        crossover heuristics as the single-chip store), 'pallas'/'xla' force
        one path (tests force 'pallas' on the CPU mesh via interpret mode)."""
        if device_dtype == "mixed":
            device_dtype = "float32"  # the bf16 shadow trick is Pallas-only
        if search_impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"Unknown search_impl: {search_impl}")
        self.mesh = mesh
        self.dim = dim
        self.n = mesh.devices.size
        self.device_dtype = device_dtype
        self.search_impl = search_impl
        self.count = 0
        self._buf = None
        self._inv_norms = None
        self._capacity = 0
        # observability: bytes shipped host->mesh (the incremental-sync test
        # asserts a mutation does not re-upload the corpus)
        self.bytes_uploaded = 0
        # weakrefs to snapshots of the CURRENT buffer: update() may only
        # donate it when none are alive (same race as core/store.py sync)
        self._snap_refs: list[weakref.ref] = []

    @property
    def capacity(self) -> int:
        return self._capacity

    def _jdtype(self):
        return {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
        }[self.device_dtype]

    def load(self, matrix: np.ndarray) -> None:
        from minivectordb_tpu.ops import scan as scan_ops

        matrix = np.ascontiguousarray(matrix, dtype=np.float32)
        self.count = matrix.shape[0]
        # pow2 up to 2^21 rows, then 2^21-multiples (ops/scan.py:
        # capacity_bucket) — both divisible by any pow2 mesh and by the
        # Pallas row tiles; round up to a multiple of n for odd mesh sizes
        # (the _use_pallas eligibility check guards the tile contract then).
        cap = scan_ops.capacity_bucket(max(self.count, 1), 1024)
        if cap % self.n:
            cap += self.n - cap % self.n
        axes = tuple(self.mesh.axis_names)
        sh = NamedSharding(self.mesh, P(axes, None))
        sh1 = NamedSharding(self.mesh, P(axes))
        if self.device_dtype in ("int8", "bfloat16"):
            # quantize/cast HOST-side (same helpers as the single-chip
            # store, so mesh and flat engines store bit-identical rows):
            # the link carries the stored bytes — 4x/2x fewer than f32 —
            # and no full-width f32 intermediate ever lands in HBM.
            dt = np.int8 if self.device_dtype == "int8" else jnp.bfloat16
            padded = np.zeros((cap, self.dim), dtype=dt)
            inorm = np.zeros((cap,), dtype=np.float32)
            if self.count:
                q, i = (
                    scan_ops.quantize_rows_int8_host(matrix)
                    if self.device_dtype == "int8"
                    else scan_ops.cast_rows_bf16_host(matrix)
                )
                padded[: self.count] = q
                inorm[: self.count] = i
            self._buf = jax.device_put(padded, sh)
            self._inv_norms = jax.device_put(inorm, sh1)
            self.bytes_uploaded += padded.nbytes + inorm.nbytes
        else:
            from minivectordb_tpu.ops.scan import row_inv_norms

            padded = np.zeros((cap, self.dim), dtype=np.float32)
            padded[: self.count] = matrix
            raw = jax.device_put(padded, sh)
            self.bytes_uploaded += padded.nbytes
            self._inv_norms = row_inv_norms(raw)
            self._buf = raw
        self._capacity = cap
        self._snap_refs = []

    def update(self, rows: np.ndarray, start: int, new_count: int) -> None:
        """Dirty-range sync: write `rows` at row `start` in place (donated
        sharded buffers; XLA partitions the update across the mesh) instead
        of re-uploading the corpus. Caller guarantees
        start + len(rows) <= capacity and new_count <= capacity."""
        from minivectordb_tpu.ops import scan as scan_ops

        rows = np.ascontiguousarray(rows, dtype=np.float32)
        self._snap_refs = [r for r in self._snap_refs if r() is not None]
        donate = not self._snap_refs
        if self.device_dtype in ("int8", "bfloat16"):
            # host-side quantize/cast: stored bytes over the link (same
            # helpers as load and the single-chip store)
            qr, inorm = (
                scan_ops.quantize_rows_int8_host(rows)
                if self.device_dtype == "int8"
                else scan_ops.cast_rows_bf16_host(rows)
            )
            wr = (
                scan_ops.write_rows_pre
                if donate
                else scan_ops.write_rows_pre_nodonate
            )
            self._buf, self._inv_norms = wr(
                self._buf, self._inv_norms,
                jnp.asarray(qr), jnp.asarray(inorm), start,
            )
            self.bytes_uploaded += qr.nbytes + inorm.nbytes
        else:
            upd = (
                scan_ops.update_rows if donate else scan_ops.update_rows_nodonate
            )
            self._buf, self._inv_norms = upd(
                self._buf, self._inv_norms, jnp.asarray(rows), start
            )
            self.bytes_uploaded += rows.nbytes
        self._snap_refs = []
        self.count = int(new_count)

    def snapshot(self) -> "DistSnapshot":
        """Frozen view for lock-free search (mirrors StoreSnapshot): captures
        the immutable sharded arrays + count so a concurrent ``load`` cannot
        tear a search in progress."""
        snap = DistSnapshot(
            self.mesh, self.n, self._buf, self._inv_norms, self.count,
            self._capacity, self.search_impl,
        )
        # Prune dead refs on every snapshot (same discipline as
        # VectorStore.snapshot): read-heavy workloads never reach the
        # write-path prune, and one dead weakref per search would otherwise
        # accumulate without bound.
        self._snap_refs = [r for r in self._snap_refs if r() is not None]
        self._snap_refs.append(weakref.ref(snap))
        return snap

    def search(self, queries: np.ndarray, k: int, mask: np.ndarray | None = None):
        return self.snapshot().search(queries, k, mask)


class DistSnapshot:
    __slots__ = ("mesh", "n", "buf", "inv_norms", "count", "capacity",
                 "search_impl", "__weakref__")

    def __init__(self, mesh, n, buf, inv_norms, count, capacity,
                 search_impl="auto"):
        self.mesh = mesh
        self.n = n
        self.buf = buf
        self.inv_norms = inv_norms
        self.count = count
        self.capacity = capacity
        self.search_impl = search_impl

    def _use_pallas(self, batch: int, k_local: int) -> bool:
        """Mirror of core/store.py:StoreSnapshot._use_pallas for the
        per-shard scan: the kernel needs local rows in whole 256-row tiles;
        'auto' keeps the measured batch>=16 crossover and TPU-only routing."""
        import os

        local_rows = self.capacity // self.n
        from minivectordb_tpu.ops.pallas_scan import _row_tile

        eligible = (
            local_rows >= 256
            and local_rows % 256 == 0  # whole 256-row tiles (kernel contract)
            and local_rows % _row_tile(self.buf.shape[1], local_rows) == 0
        )
        if not eligible or os.environ.get("MINIVECTORDB_TPU_DISABLE_PALLAS"):
            return False
        if self.search_impl == "pallas":
            return True
        if self.search_impl == "xla":
            return False
        return (
            batch >= 16
            and local_rows >= 4096
            and jax.default_backend() != "cpu"
        )

    def search(self, queries: np.ndarray, k: int, mask: np.ndarray | None = None,
               fetch: bool = True):
        """fetch=False returns DEVICE (globally-replicated output) arrays so
        async callers pipeline dispatches — same contract as
        StoreSnapshot.search / IVFSnapshot.search."""
        q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
        kb = 1
        while kb < k:
            kb <<= 1
        # Per-shard candidate width is bounded by local rows; the merge width
        # k_final recovers min(k, count) when k exceeds a shard's row count.
        kb_local = min(kb, self.capacity // self.n)
        k_final = min(kb, self.n * kb_local)
        has_mask = mask is not None
        if has_mask:
            padded = np.zeros(self.capacity, dtype=bool)
            padded[: mask.shape[0]] = mask
            mask_dev = jax.device_put(
                padded,
                NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))
            )
        else:
            mask_dev = jnp.zeros((self.n,), dtype=bool)  # placeholder
        vals, idx = _dist_scan(
            self.mesh,
            self.buf,
            self.inv_norms,
            q,
            jnp.int32(self.count),
            mask_dev,
            kb_local,
            k_final,
            has_mask,
            self._use_pallas(q.shape[0], kb_local),
        )
        if not fetch:
            return vals[:, :k], idx[:, :k]
        from minivectordb_tpu.ops.scan import fetch_results

        return fetch_results(vals[:, :k], idx[:, :k])
