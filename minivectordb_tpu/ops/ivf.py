"""IVF (inverted-file) coarse-quantized search, TPU-native.

The reference has no ANN index at all (exact FAISS/usearch scans only); the
north-star benchmark config 5 (BASELINE.md: 1M x 1024, IVF coarse-quantized,
shard-per-chip) requires one. This is an IVF-flat design laid out for XLA's
static-shape world:

- k-means trained on device (Lloyd iterations, all matmuls on the MXU);
- the corpus is re-packed CLUSTER-MAJOR into a dense (nlist, P, d) tensor,
  each list padded to the same capacity P (valid-mask carried alongside), so
  a probe is a static gather + batched matmul, never a ragged loop;
- query: score centroids -> top-nprobe lists -> gather (nprobe, P, d) ->
  masked scan + top-k. One fused jitted program end-to-end.

Recall is tunable via nprobe; with nprobe = nlist the search is exact.
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

_MASKED_SCORE = np.float32(-3.0e38)

# Test hook: route IVFSnapshot.search through the Pallas kernels even on the
# CPU backend (they run interpreted there) — covers the TPU branch offline.
_FORCE_PALLAS_ROUTE = False


_ASSIGN_CHUNK = 1 << 16  # rows per assignment step (bounds the sims matrix)


def _assign_chunked(data, centroids):
    """argmax-similarity assignment without materializing (n, nlist) at once."""
    n, d = data.shape
    chunk = min(_ASSIGN_CHUNK, n)
    pad = (-n) % chunk
    padded = jnp.pad(data, ((0, pad), (0, 0)))

    def f(x):
        sims = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        return jnp.argmax(sims, axis=1)

    out = jax.lax.map(f, padded.reshape(-1, chunk, d))
    return out.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("nlist", "iters"))
def _kmeans_device(data, key, nlist, iters):
    """Spherical k-means (cosine) on device. data: (n, d) f32, L2-normalized.

    Lloyd updates use segment_sum (scatter-add) instead of a one-hot matmul
    so memory stays O(n*d + nlist*d) — a one-hot (n, nlist) matrix would be
    16 GB at 1M x 4096 lists. Assignment is chunked for the same reason.
    """
    n = data.shape[0]
    idx = jax.random.choice(key, n, shape=(nlist,), replace=False)
    centroids = data[idx]

    def step(cent, _):
        assign = _assign_chunked(data, cent)
        sums = jax.ops.segment_sum(data, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(
            jnp.ones((n, 1), jnp.float32), assign, num_segments=nlist
        )
        new_cent = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cent)
        norms = jnp.linalg.norm(new_cent, axis=1, keepdims=True)
        new_cent = new_cent / jnp.maximum(norms, 1e-30)
        return new_cent, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids, _assign_chunked(data, centroids)


@functools.partial(jax.jit, static_argnames=("n",))
def _assign_full_device(data, centroids, n):
    """Assign every live row on device. Row scaling never changes the argmax
    across unit-norm centroids, so RAW rows are assigned directly — the
    normalized corpus is never materialized for assignment."""
    return _assign_chunked(data[:n], centroids)


@jax.jit
def _gather_normalized_sample(data, inv_norms, idx):
    return data[idx] * inv_norms[idx][:, None]


_SCATTER_CHUNK = 1 << 17  # rows per scatter step (bounds the transient)


@functools.partial(jax.jit, static_argnames=("n", "slots", "out_dtype"))
def _scatter_lists(data, inv_norms, dest, n, slots, out_dtype):
    """Normalize + cast + cluster-major scatter, chunked. data (cap, d);
    dest (n,) flat slot per row. Returns (slots, d) lists.

    Chunking bounds the transient normalized-rows buffer to CHUNK x d: at
    1M x 1024 f32 an unfused single-shot scatter materializes a 4 GB operand
    while the corpus (4 GB) and output (4+ GB) are both live, which pushed
    the whole build past HBM on a 16 GB chip (round-3 OOM). The unrolled
    loop updates the output buffer in place (XLA proves single use)."""
    out = jnp.zeros((slots, data.shape[1]), out_dtype)
    for lo in range(0, n, _SCATTER_CHUNK):
        hi = min(lo + _SCATTER_CHUNK, n)
        rows = data[lo:hi] * inv_norms[lo:hi, None]
        if out_dtype == jnp.int8:
            # rows are unit-norm, so a global 127 scale is the usearch-style
            # symmetric quantizer; per-slot inverse norms (computed after the
            # scatter) absorb the rounding in the cosine reconstruction
            rows = jnp.clip(jnp.round(rows * 127.0), -127, 127)
        out = out.at[dest[lo:hi]].set(rows.astype(out_dtype))
    return out


@jax.jit
def _slot_inv_norms(lists_flat):
    """1/||int8 slot|| per packed slot (0 for empty slots): the f32 scale
    that turns the i32 probe dot back into a cosine."""
    x = lists_flat.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x * x, axis=-1))
    return jnp.where(n > 0, 1.0 / jnp.maximum(n, 1e-30), 0.0)


def _rescore_kwide(k: int, lists_dtype) -> int:
    """Stage-1 candidate width for the two-stage quantized search. Measured
    at 1M x 1024 (clustered corpus, k=10): bf16 candidates reach recall 1.0
    with a 4x margin; int8's coarser scores need ~10x before every true
    neighbor lands inside the candidate set (kwide 40 -> recall 0.978,
    kwide 100 -> 1.0)."""
    if lists_dtype == jnp.int8:
        return max(10 * k, k + 90)
    return max(4 * k, k + 30)


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_rescore(data, inv_norms, q, cand_vals, cand_ids, k):
    """Re-rank quantized-path candidates against the f32 corpus.

    Quantized lists (bf16/int8) lose ~3 decimal digits of score precision;
    at 1M rows the top-10 neighbors sit within that noise floor, so the
    quantized TOP-K ORDER is wrong even when the candidate SET is right
    (measured: recall@10 flat in nprobe at 0.967 bf16 / 0.682 int8). The fix
    is the classic two-stage pattern: take a wider quantized top-K', gather
    those K' rows from the f32 corpus resident in HBM (the store's packed
    buffer — no extra copy), and rescore exactly. ~2 orders of magnitude
    cheaper than the probe itself (B*K' rows vs B*nprobe*P).

    cand_vals/cand_ids: (B, K') quantized scores + global row ids. Masked
    candidates (score <= _MASKED_SCORE/2) stay masked. Returns (B, k) f32.
    """
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    rows = data[cand_ids] * inv_norms[cand_ids][..., None]  # (B, K', d)
    s = jnp.einsum(
        "bkd,bd->bk", rows, qn, preferred_element_type=jnp.float32
    )
    s = jnp.where(cand_vals > _MASKED_SCORE / 2, s, _MASKED_SCORE)
    vals, pos = jax.lax.top_k(s, k)
    ids = jnp.take_along_axis(cand_ids, pos, axis=-1)
    return vals, ids


def masked_overfetch_width(kk: int, mask_frac: float, count: int) -> int:
    """Candidate-stage width for a filter-masked probe: with fraction f of
    rows passing, a K-wide candidate set holds ~f*K eligible rows — widen by
    2/f (pow2-bucketed so each width compiles once) to make a kk-deep
    eligible set likely. Single source of truth for the single-device and
    mesh snapshots: a tuning change here moves both identically."""
    want = int(np.ceil(2.0 * kk / max(min(mask_frac, 1.0), 1e-6)))
    kk_eff = 1 << (max(want, 1) - 1).bit_length()
    return max(kk, min(kk_eff, count))


@jax.jit
def _mask_scores(mask, vals, ids):
    """Sentinel-mask candidate scores whose global row fails the filter mask
    (True = eligible). Padded/invalid candidates already carry the sentinel
    and keep it (their ids may be arbitrary — the score check wins)."""
    return jnp.where(mask[ids], vals, _MASKED_SCORE)


@functools.partial(jax.jit, static_argnames=("k",))
def _select_topk(vals, ids, k):
    v, pos = jax.lax.top_k(vals, k)
    return v, jnp.take_along_axis(ids, pos, axis=-1)


@functools.partial(jax.jit, static_argnames=("nprobe", "k"))
def _ivf_search(centroids, lists, list_ids, list_valid, q, nprobe, k,
                list_inv=None):
    """centroids (L, d); lists (L, P, d) bf16/f32/int8; list_ids (L, P)
    int32; list_valid (L, P) bool; q (B, d) f32; list_inv (L, P) f32 for
    int8 lists (per-slot cosine reconstruction scale). Returns (B, k)
    scores + global ids.

    Queries are processed via lax.map so the gathered probe set stays at
    (nprobe, P, d) per step — a batched gather would materialize
    B * nprobe * P * d floats at once.
    """
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    # score centroids BATCHED, exactly like the Pallas paths: a per-query
    # matvec accumulates in a different order, and near-tied centroid scores
    # would then flip probe sets between formulations
    cscores_all = jnp.dot(qn, centroids.T, preferred_element_type=jnp.float32)
    _, probe_all = jax.lax.top_k(cscores_all, nprobe)  # (B, nprobe)
    if list_inv is not None:
        # mirror the device int8 path bit-for-bit: quantized query, f32
        # accumulation (int8 dots fit float32 exactly: 1024 * 127^2 < 2^24)
        qi = jnp.clip(jnp.round(qn * 127.0), -127, 127)
        qinv_all = 1.0 / jnp.maximum(
            jnp.sqrt(jnp.sum(qi * qi, axis=-1)), 1e-30
        )
    else:
        qi = qn
        qinv_all = jnp.ones((qn.shape[0],), jnp.float32)

    def one(args):
        query, probe, qinv = args
        qd = query if list_inv is not None else query.astype(lists.dtype)

        def scan_list(list_id):
            # contiguous dynamic-slice of one list block (fast DMA; a fancy
            # gather of all probed blocks at once lowers to a slow scatter/
            # gather pass)
            block = jax.lax.dynamic_index_in_dim(
                lists, list_id, axis=0, keepdims=False
            )  # (P, d)
            if list_inv is not None:
                inv_row = jax.lax.dynamic_index_in_dim(
                    list_inv, list_id, axis=0, keepdims=False
                )
                s = jnp.dot(
                    block.astype(jnp.float32), qd,
                    preferred_element_type=jnp.float32,
                ) * inv_row * qinv
            else:
                s = jnp.dot(block, qd, preferred_element_type=jnp.float32)
            valid = jax.lax.dynamic_index_in_dim(
                list_valid, list_id, axis=0, keepdims=False
            )
            ids = jax.lax.dynamic_index_in_dim(
                list_ids, list_id, axis=0, keepdims=False
            )
            return jnp.where(valid, s, _MASKED_SCORE), ids

        scores, cand_ids = jax.lax.map(scan_list, probe)  # (nprobe, P)
        vals, pos = jax.lax.top_k(scores.reshape(-1), k)
        ids = cand_ids.reshape(-1)[pos]
        return vals, ids

    return jax.lax.map(one, (qi, probe_all, qinv_all))


def _remap_ids_for_deletes(ids, valid, rows, count):
    """Shared tombstone+remap core: returns (ids, valid, n_deleted)."""
    rows = np.asarray(sorted(set(int(r) for r in rows)), dtype=np.int64)
    rows = rows[rows < count]
    if rows.size == 0:
        return ids, valid, 0
    doomed = valid & np.isin(ids, rows)
    valid = valid & ~doomed
    # compacted id = id - (# deleted rows below it); only live slots
    # matter (dead slots keep stale ids, never read past the mask)
    shift = np.searchsorted(rows, ids, side="left").astype(ids.dtype)
    ids = np.where(valid, ids - shift, ids)
    return ids, valid, int(rows.size)


class IVFIndex:
    """Cluster-major padded IVF-flat index over a fixed corpus snapshot.

    Built once from the packed matrix (bulk path — incremental inserts go to
    the exact scan until the next build, like classic IVF train/add).
    """

    def __init__(self, nlist: int = 1024, nprobe: int = 32, iters: int = 10,
                 device_dtype: str = "float32", seed: int = 0):
        self.nlist = nlist
        self.nprobe = nprobe
        self.iters = iters
        self.device_dtype = device_dtype
        self.seed = seed
        self._precompile_thread = None
        self._precompiled = {}  # arg-shape-keyed jax compiled executables
        # duplicate centroids created by skew splitting (see build): search
        # widens the probe by this many slots so nprobe keeps counting
        # distinct trained clusters
        self.n_dup = 0
        self.centroids = None
        self._lists = None
        self._list_ids = None
        self._list_valid = None
        self._list_inv = None  # int8 lists only: per-slot 1/||int8 row||
        # f32 corpus refs (the store's resident HBM buffer — no copy) for
        # the two-stage exact rescore of quantized (bf16/int8) candidates
        self._data = None
        self._inv_norms = None
        self.pad_len = 0
        # count: live vectors == the corpus row-prefix length this index
        # references (each live prefix row occupies exactly one valid slot,
        # an invariant delete_rows preserves). Dead slots accumulate in the
        # packed lists until the owner's rebuild policy triggers.
        self.count = 0

    def _train_shapes(self, n: int) -> tuple[int, int]:
        """(nlist, sample_rows) the build path will use for a corpus of n
        live rows — kept in lockstep with build()."""
        nlist = min(self.nlist, max(1, n // 4))
        train_cap = max(nlist * 64, 100_000)
        return nlist, min(n, train_cap)

    def precompile_async(self, n: int, d: int, dev_cap: int) -> None:
        """Compile the build-path device programs on a background thread,
        overlapping an imminent corpus upload.

        The 1M x 1024 cold start runs a ~166 s host->HBM corpus transfer and
        THEN a ~40 s build dominated by XLA compiles (the k-means Lloyd scan
        and the full-corpus assignment) — pure host-CPU work that needs no
        link bandwidth. Engines call this right before store.sync() when a
        bulk upload is pending so the compiles ride under the transfer;
        build() then runs the pre-built executables directly. Best-effort:
        any failure falls back to the normal jit path.
        """
        nlist, m = self._train_shapes(n)
        iters = self.iters

        def work():
            try:
                sample = jax.ShapeDtypeStruct((m, d), jnp.float32)
                key = jax.ShapeDtypeStruct((2,), jnp.uint32)
                self._precompiled[("kmeans", m, d, nlist, iters)] = (
                    _kmeans_device.lower(
                        sample, key, nlist=nlist, iters=iters
                    ).compile()
                )
                data = jax.ShapeDtypeStruct((dev_cap, d), jnp.float32)
                cent = jax.ShapeDtypeStruct((nlist, d), jnp.float32)
                self._precompiled[("assign", dev_cap, d, nlist, n)] = (
                    _assign_full_device.lower(data, cent, n=n).compile()
                )
            except Exception:  # pragma: no cover — best-effort warming
                self._precompiled.clear()

        t = threading.Thread(
            target=work, name="mvdb-ivf-precompile", daemon=False
        )
        t.start()
        self._precompile_thread = t

    def _take_compiled(self, kind: str, key_rest: tuple):
        """Pop a pre-built executable (joining the compile thread first); a
        shape mismatch simply misses and the caller uses the jit path."""
        if self._precompile_thread is not None:
            self._precompile_thread.join()
            self._precompile_thread = None
        return self._precompiled.pop((kind, *key_rest), None)

    def _lists_dtype(self):
        if self.device_dtype == "bfloat16":
            return jnp.bfloat16
        if self.device_dtype == "int8":
            return jnp.int8
        return jnp.float32

    def _upload(self, matrix, count):
        """Returns (data, inv_norms, n) on device. ``matrix`` may be a host
        array or an already-resident (possibly capacity-padded) jax array —
        the store's HBM buffer feeds builds with zero host round-trips."""
        from minivectordb_tpu.ops.scan import chunked_device_put, row_inv_norms

        if isinstance(matrix, jax.Array):
            data = matrix
            n = int(matrix.shape[0]) if count is None else int(count)
        else:
            host = np.ascontiguousarray(matrix, dtype=np.float32)
            n = host.shape[0] if count is None else int(count)
            data = chunked_device_put(host)
        inv = row_inv_norms(data)
        return data, inv, n

    def build(self, matrix, count: int | None = None, inv_norms=None) -> None:
        """Train + pack, everything heavy on device (the round-1 build spent
        ~17 min at 1M x 1024 on host normalization, host-slab uploads and a
        4 GB host scatter; here the corpus crosses the host boundary at most
        once and only int32 bookkeeping ever comes back)."""
        data, inv, n = self._upload(matrix, count)
        if inv_norms is not None:
            inv = inv_norms
        d = int(data.shape[1])
        self.count = n
        nlist, m = self._train_shapes(n)
        key = jax.random.PRNGKey(self.seed)
        # train on a bounded sample (classic IVF practice), assign everything
        if n > m:
            rng = np.random.default_rng(self.seed)
            idx = np.sort(rng.choice(n, m, replace=False)).astype(np.int32)
            sample = _gather_normalized_sample(data, inv, jnp.asarray(idx))
        else:
            sample = _gather_normalized_sample(
                data, inv, jnp.arange(n, dtype=jnp.int32)
            )
        # precompile_async-built executables run the SAME traced program, so
        # results are identical to the jit path; any mismatch falls back
        km = self._take_compiled("kmeans", (m, d, nlist, self.iters))
        try:
            centroids, _ = (
                km(sample, key)
                if km is not None
                else _kmeans_device(sample, key, nlist, self.iters)
            )
        except Exception:
            centroids, _ = _kmeans_device(sample, key, nlist, self.iters)
        del sample
        asg = self._take_compiled(
            "assign", (int(data.shape[0]), d, nlist, n)
        )
        try:
            assign_dev = (
                asg(data, centroids)
                if asg is not None
                else _assign_full_device(data, centroids, n)
            )
        except Exception:
            assign_dev = _assign_full_device(data, centroids, n)
        assign = np.array(assign_dev)  # writable copy
        centroids_np = np.asarray(centroids)

        # Skew control: the packed layout costs nlist_eff * P * d memory, so
        # P must stay near the BALANCED list size regardless of skew. Split
        # every cluster above cap into duplicate centroids (identical query
        # similarity -> duplicates rank adjacent, so a probed centroid's
        # overflow lists get probed with it) and drop empty clusters
        # entirely (an empty list can never contain a result). Total slots
        # are then <= ~n * 1.5 + nlist * small.
        counts = np.bincount(assign, minlength=nlist)
        # Pad cap: every list block is DMA'd whole at probe time, so padding
        # waste is pure HBM-bandwidth waste (the round-2 1.5x cap put pad at
        # 384 for a 244-row average — 57% more bytes per probe). Align the
        # cap itself to the kernel's 128-row requirement and keep it tight:
        # oversized lists split into duplicate centroids below.
        avg = n / max(1, nlist)
        cap = int(max(8, np.ceil(1.02 * avg)))
        if cap > 128:
            cap = (cap + 127) // 128 * 128
        new_centroids = [centroids_np]
        next_id = nlist
        for c in np.nonzero(counts > cap)[0]:
            rows = np.nonzero(assign == c)[0]
            n_parts = int(np.ceil(len(rows) / cap))
            for p in range(1, n_parts):
                part = rows[p * cap : (p + 1) * cap]
                assign[part] = next_id
                new_centroids.append(centroids_np[c][None, :])
                next_id += 1
        # Splitting grows the centroid count past the configured nlist, which
        # would silently break the documented "nprobe = nlist is exact"
        # contract: record the duplicate count so search can scale the probe
        # slot count by the split factor (duplicates score identically to
        # their parent, so they interleave with the distinct clusters a
        # user's nprobe was tuned against).
        self.n_dup = next_id - nlist
        if next_id > nlist:
            centroids_np = np.vstack(new_centroids)
            nlist = next_id
        counts = np.bincount(assign, minlength=nlist)
        nonempty = np.nonzero(counts > 0)[0]
        if len(nonempty) < nlist:
            remap = np.full(nlist, -1, dtype=np.int64)
            remap[nonempty] = np.arange(len(nonempty))
            assign = remap[assign]
            centroids_np = centroids_np[nonempty]
            nlist = len(nonempty)
        self.centroids = jnp.asarray(centroids_np)

        # cluster-major layout bookkeeping (int32-sized host work only):
        # rank of each row within its cluster = position in the sorted order
        # minus the cluster's start
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        counts = np.bincount(sorted_assign, minlength=nlist)
        pad = int(max(1, counts.max()))
        # round pad to a multiple of 128: the Pallas probe kernel stores
        # per-list score rows at lane offsets i*P, which Mosaic must prove
        # 128-aligned (memory cost vs %8 rounding is < ~1.5x at cap>=256)
        pad = (pad + 127) // 128 * 128
        self.pad_len = pad

        starts = np.zeros(nlist, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        rank = np.arange(len(order), dtype=np.int64) - starts[sorted_assign]
        slot = sorted_assign.astype(np.int64) * pad + rank
        list_ids = np.zeros(nlist * pad, dtype=np.int32)
        valid = np.zeros(nlist * pad, dtype=bool)
        list_ids[slot] = order
        valid[slot] = True
        self._finish_pack(data, inv, slot, order, n, nlist, pad,
                          list_ids, valid)

    def _finish_pack(self, data, inv, slot, order, n, nlist, pad,
                     list_ids, valid) -> None:
        """Device scatter into the padded cluster-major tensor; normalize +
        dtype cast are fused into the scatter operand (rows store normalized
        so IP == cosine)."""
        dest = np.empty(n, dtype=np.int32)
        dest[order] = slot.astype(np.int32)
        lists_flat = _scatter_lists(
            data, inv, jnp.asarray(dest), n, nlist * pad, self._lists_dtype()
        )
        if self._lists_dtype() != jnp.float32:
            # quantized lists: keep refs to the f32 corpus (already resident
            # — the store's buffer) so snapshots can rescore exactly
            self._data = data
            self._inv_norms = inv
        d = int(data.shape[1])
        self._lists = lists_flat.reshape(nlist, pad, d)
        # int8 lists carry a per-slot f32 inverse-norm table (the cosine
        # reconstruction scale); immutable after build, deletes only touch
        # ids/valid, so it lives OUTSIDE the atomically-swapped tuple
        self._list_inv = (
            _slot_inv_norms(lists_flat).reshape(nlist, pad)
            if lists_flat.dtype == jnp.int8
            else None
        )
        self._list_ids = jnp.asarray(list_ids.reshape(nlist, pad))
        self._list_valid = jnp.asarray(valid.reshape(nlist, pad))
        # single-attribute table tuple: searches run OUTSIDE the owning
        # database's lock, so they must read (lists, ids, valid) in one
        # atomic reference grab — delete_rows swaps this tuple wholesale
        # (reading ids from one version and valid from another could
        # resurrect a deleted row under a stale-remapped id)
        self._tables = (self._lists, self._list_ids, self._list_valid)

    def refresh_corpus(self, data, inv_norms) -> None:
        """Swap the exact-rescore corpus refs (quantized lists only).

        Required after the owning store compacts rows: delete_rows remaps
        slot ids to post-compaction positions, so the retained build-time
        buffer no longer lines up with them — rescore would gather the wrong
        rows. The owner calls this with its freshly-synced (compacted)
        buffer under its lock, atomically with the id remap."""
        if self._data is not None:
            self._data = data
            self._inv_norms = inv_norms

    def delete_rows(self, rows) -> int:
        """Tombstone deleted global rows in place and remap the surviving
        slot ids to their post-compaction positions. Returns the number of
        rows tombstoned (rows >= count are ignored — they were never in the
        index).

        The owning database compacts its row matrix on delete (mirroring
        reference vector_database.py:126), shifting every global id above a
        deleted row down by the number of deletions below it. Remapping the
        (nlist, P) id table (pure int32 host work) keeps the trained
        centroids and the packed list tensor valid — the dead slots' stale
        vectors are masked by list_valid at probe time — so a delete no
        longer forces a full k-means rebuild (round-2 known gap)."""
        ids, valid, n_del = _remap_ids_for_deletes(
            np.asarray(self._list_ids), np.asarray(self._list_valid),
            rows, self.count,
        )
        if n_del:
            self._list_ids = jnp.asarray(ids)
            self._list_valid = jnp.asarray(valid)
            self._tables = (self._lists, self._list_ids, self._list_valid)
            self.count -= n_del
        return n_del

    def tombstone_rows(self, rows) -> int:
        """Mark the slots of tombstoned global rows invalid WITHOUT remapping
        ids (the deferred-compaction delete path: physical row ids do not
        move, so surviving slot ids stay correct as-is; ``count`` keeps its
        physical meaning). Returns the number of newly-invalid slots."""
        rows = np.asarray(sorted({int(r) for r in rows}), dtype=np.int64)
        rows = rows[(rows >= 0) & (rows < self.count)]
        if rows.size == 0:
            return 0
        ids = np.asarray(self._list_ids)
        valid = np.asarray(self._list_valid)
        doomed = valid & np.isin(ids, rows)
        n_del = int(doomed.sum())
        if n_del:
            self._list_valid = jnp.asarray(valid & ~doomed)
            self._tables = (self._lists, self._list_ids, self._list_valid)
        return n_del

    @staticmethod
    def state_tombstone_rows(state: dict, rows) -> int:
        """tombstone_rows for a persisted (not yet attached) state dict —
        clears list_valid in place without remapping ids or count."""
        rows = np.asarray(sorted({int(r) for r in rows}), dtype=np.int64)
        rows = rows[(rows >= 0) & (rows < int(state["count"]))]
        if rows.size == 0:
            return 0
        ids = np.asarray(state["list_ids"])
        valid = np.asarray(state["list_valid"])
        doomed = valid & np.isin(ids, rows)
        n_del = int(doomed.sum())
        if n_del:
            state["list_valid"] = valid & ~doomed
        return n_del

    @staticmethod
    def state_after_deletes(state: dict, rows) -> int:
        """delete_rows for a persisted (not yet attached) state dict —
        mutates list_ids/list_valid/count in place; returns rows removed."""
        ids, valid, n_del = _remap_ids_for_deletes(
            np.asarray(state["list_ids"]), np.asarray(state["list_valid"]),
            rows, int(state["count"]),
        )
        if n_del:
            state["list_ids"] = ids
            state["list_valid"] = valid
            state["count"] = int(state["count"]) - n_del
        return n_del

    # -- persistence ---------------------------------------------------------

    def state_dict(self) -> dict:
        """Small host-side state: centroids + layout. The packed list tensor
        itself is NOT stored (it duplicates the corpus); ``from_state``
        rebuilds it with one device scatter from the embeddings."""
        return {
            "nlist": int(self.centroids.shape[0]),
            "nprobe": self.nprobe,
            # True when nprobe came from recall-target calibration — the
            # engine re-adopts it as the serving default on reattach
            "nprobe_calibrated": bool(getattr(self, "nprobe_calibrated",
                                              False)),
            "iters": self.iters,
            "seed": self.seed,
            "n_dup": int(self.n_dup),
            "pad_len": self.pad_len,
            "count": self.count,
            "device_dtype": self.device_dtype,
            "centroids": np.asarray(self.centroids),
            "list_ids": np.asarray(self._list_ids),
            "list_valid": np.asarray(self._list_valid),
        }

    @classmethod
    def from_state(cls, state: dict, matrix, count: int | None = None,
                   inv_norms=None) -> "IVFIndex":
        """Reattach a persisted layout to the corpus without re-training."""
        idx = cls(
            nlist=state["nlist"],
            nprobe=state["nprobe"],
            iters=state.get("iters", 10),
            device_dtype=state.get("device_dtype", "float32"),
            seed=state.get("seed", 0),
        )
        idx.nprobe_calibrated = bool(state.get("nprobe_calibrated", False))
        idx.n_dup = int(state.get("n_dup", 0))
        idx.pad_len = int(state["pad_len"])
        idx.count = int(state["count"])
        idx.centroids = jnp.asarray(state["centroids"])
        list_ids = np.asarray(state["list_ids"])
        valid = np.asarray(state["list_valid"])
        nlist, pad = list_ids.shape
        data, inv, n = idx._upload(matrix, count)
        if inv_norms is not None:
            inv = inv_norms
        if n < idx.count:
            raise ValueError(
                f"IVF state covers {idx.count} rows but corpus has {n}"
            )
        flat_valid = valid.reshape(-1)
        flat_ids = list_ids.reshape(-1)
        slot = np.nonzero(flat_valid)[0]
        order = flat_ids[slot]
        idx._finish_pack(data, inv, slot, order, idx.count, nlist, pad,
                         flat_ids, flat_valid)
        return idx

    def snapshot(self) -> "IVFSnapshot":
        """Frozen searchable view. The owning database captures this UNDER
        its lock (together with the row-aligned uids/metadata lists) and
        scans outside it: delete_rows mutates this index in place, so a
        search bound to a live IVFIndex could resolve freshly-remapped ids
        against pre-delete uid lists."""
        return IVFSnapshot(
            self.centroids, self._tables, self.count, self.nprobe,
            self._list_inv, self._data, self._inv_norms, self.n_dup,
        )

    def search(self, queries: np.ndarray, k: int, nprobe: int | None = None):
        return self.snapshot().search(queries, k, nprobe)


class IVFSnapshot:
    __slots__ = ("centroids", "tables", "count", "nprobe", "list_inv",
                 "data", "inv_norms", "n_dup")

    def __init__(self, centroids, tables, count, nprobe, list_inv=None,
                 data=None, inv_norms=None, n_dup=0):
        self.centroids = centroids
        self.tables = tables
        self.count = count
        self.nprobe = nprobe
        self.n_dup = n_dup
        self.list_inv = list_inv
        # f32 corpus refs (immutable device arrays) for exact rescore of
        # quantized candidates; None for f32 lists (scores already exact)
        self.data = data
        self.inv_norms = inv_norms

    def search(self, queries: np.ndarray, k: int, nprobe: int | None = None,
               fetch: bool = True, mask_dev=None, mask_frac: float = 1.0):
        """fetch=False returns DEVICE arrays (no result transfer), so async
        callers can pipeline several dispatches before one drain — same
        contract as StoreSnapshot.search(fetch=False).

        mask_dev: optional device bool array (True = row eligible), length
        >= the corpus row space the packed ids index into. The probe widens
        its candidate stage by ~1/mask_frac (the filter's passing fraction)
        so enough eligible rows survive the cut, then sentinel-masks
        ineligible candidates before the final top-k. Rows that still come
        up short carry sentinel scores — the owning engine falls back to the
        exact masked scan for those (count-guarantee stays with the engine).
        """
        nprobe = self.nprobe if nprobe is None else nprobe
        # nprobe counts DISTINCT trained clusters: skew splitting stores
        # oversized clusters under duplicate centroids, so scale the slot
        # count by the split factor (nlist_eff / distinct). This keeps the
        # probed-fraction semantics a user tunes against independent of
        # skew, and — because ceil(distinct * eff/distinct) = eff — keeps
        # the documented "nprobe = nlist is exact" contract.
        nlist_eff = int(self.centroids.shape[0])
        distinct = max(1, nlist_eff - self.n_dup)
        nprobe = min(-(-nprobe * nlist_eff // distinct), nlist_eff)
        from minivectordb_tpu.ops import scan as _scan_ops

        if _scan_ops.is_device_array(queries):
            # zero-copy device-resident batch: no host bounce, no re-upload
            q = _scan_ops.as_device_queries(queries)
        else:
            q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
        kk = min(k, self.count)
        if kk <= 0:
            # every indexed row tombstoned while stale stays under the
            # rebuild floor: a 0-wide top-k is undefined for the kernels
            b = int(q.reshape(-1, q.shape[-1]).shape[0])
            return (np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32))
        lists, list_ids, list_valid = self.tables
        kk_eff = (
            masked_overfetch_width(kk, mask_frac, self.count)
            if mask_dev is not None
            else kk
        )
        # two-stage search for quantized lists: wider quantized top-K' then
        # exact f32 rescore (quantized score noise reorders true neighbors;
        # see _exact_rescore). The margin only needs the true top-k to land
        # anywhere in the top-K' candidate set.
        rescore = self.data is not None and lists.dtype != jnp.float32
        if rescore:
            kwide = min(
                _rescore_kwide(kk_eff, lists.dtype),
                nprobe * int(lists.shape[1]),
            )
        elif mask_dev is not None:
            kwide = min(kk_eff, nprobe * int(lists.shape[1]))
        else:
            kwide = kk
        if _FORCE_PALLAS_ROUTE or jax.default_backend() != "cpu":
            # _FORCE_PALLAS_ROUTE: tests take this branch on the CPU backend
            # (the kernels themselves switch to interpret mode there), so
            # the TPU-route integration — kwide plumbing, selector choice,
            # mask/rescore chaining — is exercised without a chip
            from minivectordb_tpu.ops.pallas_ivf import (
                pallas_ivf_search,
                pallas_ivf_search_grouped,
            )

            if q.shape[0] >= 16 or self.list_inv is not None:
                # batch-first grouped probe: pairs are sorted by list on
                # device so each touched list block is DMA'd ONCE per batch
                # and scored against all its queries in one MXU matmul —
                # HBM traffic ~ one sweep of the PROBED subset instead of
                # B * nprobe block reads (round-3 VERDICT #1). int8 lists
                # always take this path (the per-pair kernel is f32/bf16).
                vals, ids = pallas_ivf_search_grouped(
                    self.centroids, lists, list_ids, list_valid, q, nprobe,
                    kwide, list_inv=self.list_inv,
                    # two-stage search re-sorts candidates exactly, so the
                    # wide selection only needs SET membership — ApproxTopK
                    # is much faster than exact top_k at nprobe*P width
                    selector="approx" if rescore else "exact",
                )
            else:
                # small batches are latency-bound; the per-pair paged kernel
                # skips the grouping bookkeeping
                vals, ids = pallas_ivf_search(
                    self.centroids, lists, list_ids, list_valid, q, nprobe,
                    kwide,
                )
        else:
            vals, ids = _ivf_search(
                self.centroids, lists, list_ids, list_valid, q, nprobe,
                kwide, list_inv=self.list_inv,
            )
        if mask_dev is not None:
            # sentinel-mask ineligible candidates BEFORE the rescore cut so
            # failing rows can't crowd eligible ones out of the final top-k
            vals = _mask_scores(mask_dev, vals, ids)
        if rescore:
            vals, ids = _exact_rescore(
                self.data, self.inv_norms, q, vals, ids, kk
            )
        elif mask_dev is not None:
            vals, ids = _select_topk(vals, ids, min(kk, int(vals.shape[1])))
        if not fetch:
            return vals, ids
        from minivectordb_tpu.ops.scan import fetch_results

        return fetch_results(vals, ids)
