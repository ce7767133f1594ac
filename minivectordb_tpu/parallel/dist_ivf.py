"""Shard-per-chip IVF: lists partitioned across the device mesh.

BASELINE.md config 5 names "IVF coarse-quantized search, shard-per-chip on
v5e-8". The layout: the trained cluster-major list tensor (L, P, d) is
partitioned on the LIST axis across a 1-D mesh; each chip holds L/n lists
plus its slice of the centroid table. A query runs per chip as: score local
centroids -> probe the local top-p lists (p = ceil(nprobe / n_devices)) ->
local top-k over p*P candidates -> ICI all-gather -> merged global top-k.

Probing the per-shard top-p rather than the global top-nprobe is the classic
Faiss IndexShards recipe: total probed lists is still ~nprobe, the probe set
is the union of per-shard winners (a superset heuristic of the global
top-nprobe whenever lists are spread randomly), and no cross-chip
coordination is needed before the final merge. With p >= ceil(L_shard) the
probe is exhaustive and results equal the exact scan.

The k-means training itself runs single-device (ops/ivf.py) — at the corpus
sizes the reference targets the trained state is MBs; only the packed list
tensor is large, and it is resharded here without a host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minivectordb_tpu.ops.ivf import _remap_ids_for_deletes, _rescore_kwide
from minivectordb_tpu.parallel.mesh import SHARD_AXIS

_MASKED_SCORE = np.float32(-3.0e38)


def _local_probe_merge(cent, cent_live, lists, list_ids, list_valid,
                       list_inv, q, corpus, corpus_inv, cand_mask, p,
                       k_local, k_final, kk, sharded_rescore, has_mask):
    """Per-device body under shard_map. cent (L/n, d); lists (L/n, P, d).

    list_inv (L/n, P) f32 is the per-slot cosine reconstruction scale for
    int8 lists (ops/ivf.py:_slot_inv_norms); for f32/bf16 lists it is a
    placeholder operand that dead-code-eliminates. A float query must NOT be
    `astype(int8)` (truncation collapses unit-norm components to {-1,0,1}):
    mirror the single-device int8 path — symmetric 127-scale rounding with
    f32 accumulation (exact: 1024 * 127^2 < 2^24).

    sharded_rescore: the exact-rescore stage of the two-stage quantized
    search runs IN here, against a ROW-partitioned f32 corpus (corpus
    (R/n, d) + corpus_inv (R/n,) — the engine's distributed exact-scan
    buffer), instead of gathering from a single-device corpus copy: after
    the all-gather merge every chip holds the same (B, k_final) candidate
    list; each chip rescores exactly the candidates whose global row id
    falls in its row block, a pmax combines them (every other chip
    contributes the sentinel), and the final top-k runs replicated. No chip
    ever needs the whole f32 corpus resident — the per-chip rescore
    footprint is corpus/n + a (B, k_final, d) gather, and the only traffic
    beyond the probe's merge is one (B, k_final) pmax.

    has_mask: cand_mask is a replicated bool row-eligibility array (True =
    row passes the metadata filter), applied to the merged candidates
    BEFORE the rescore cut — same ordering as the single-device chain
    (_mask_scores then _exact_rescore, ops/ivf.py)."""
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    int8 = lists.dtype == jnp.int8
    if int8:
        qq = jnp.clip(jnp.round(qn * 127.0), -127, 127)
        qinv = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(qq * qq, axis=-1)), 1e-30)
    else:
        qq = qn
        qinv = jnp.ones((qn.shape[0],), jnp.float32)

    def one(args):
        query, qd, qiv = args
        cscores = jnp.dot(cent, query, preferred_element_type=jnp.float32)
        cscores = jnp.where(cent_live, cscores, _MASKED_SCORE)
        _, probe = jax.lax.top_k(cscores, p)  # local list indices

        def scan_list(lid):
            block = jax.lax.dynamic_index_in_dim(lists, lid, 0, keepdims=False)
            if int8:
                inv_row = jax.lax.dynamic_index_in_dim(
                    list_inv, lid, 0, keepdims=False
                )
                s = jnp.dot(
                    block.astype(jnp.float32), qd,
                    preferred_element_type=jnp.float32,
                ) * inv_row * qiv
            else:
                s = jnp.dot(
                    block, qd.astype(lists.dtype),
                    preferred_element_type=jnp.float32,
                )
            valid = jax.lax.dynamic_index_in_dim(
                list_valid, lid, 0, keepdims=False
            )
            ids = jax.lax.dynamic_index_in_dim(
                list_ids, lid, 0, keepdims=False
            )
            return jnp.where(valid, s, _MASKED_SCORE), ids

        scores, cand_ids = jax.lax.map(scan_list, probe)  # (p, P)
        vals, pos = jax.lax.top_k(scores.reshape(-1), k_local)
        return vals, cand_ids.reshape(-1)[pos]

    lvals, lidx = jax.lax.map(one, (qn, qq, qinv))  # (B, k_local)

    all_vals = jax.lax.all_gather(lvals, SHARD_AXIS, axis=0)  # (n, B, kl)
    all_idx = jax.lax.all_gather(lidx, SHARD_AXIS, axis=0)
    n, b, kl = all_vals.shape
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, n * kl)
    flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, n * kl)
    mvals, mpos = jax.lax.top_k(flat_vals, min(k_final, n * kl))
    midx = jnp.take_along_axis(flat_idx, mpos, axis=-1)
    if has_mask:
        mvals = jnp.where(cand_mask[midx], mvals, _MASKED_SCORE)
    if sharded_rescore:
        local_rows = corpus.shape[0]
        row_lo = jax.lax.axis_index(SHARD_AXIS) * local_rows
        loc = jnp.clip(midx - row_lo, 0, local_rows - 1)
        # candidates this chip owns AND that survived the filter/padding
        # (padded slots carry arbitrary ids — the sentinel check wins)
        own = (
            (midx >= row_lo)
            & (midx < row_lo + local_rows)
            & (mvals > _MASKED_SCORE / 2)
        )
        g = corpus[loc] * corpus_inv[loc][..., None]  # (B, k_final, d)
        s = jnp.einsum(
            "bkd,bd->bk", g, qn, preferred_element_type=jnp.float32
        )
        s = jnp.where(own, s, _MASKED_SCORE)
        # exactly one chip owns each live candidate; the rest hold the
        # sentinel, so a max-combine reconstructs the full exact scores
        s = jax.lax.pmax(s, SHARD_AXIS)
        vals, pos = jax.lax.top_k(s, kk)
        return vals, jnp.take_along_axis(midx, pos, axis=-1)
    return mvals, midx


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "p", "k_local", "k_final", "kk", "sharded_rescore", "has_mask"
    ),
)
def _dist_ivf_search(mesh: Mesh, cent, cent_live, lists, list_ids,
                     list_valid, list_inv, q, corpus, corpus_inv, cand_mask,
                     p, k_local, k_final, kk, sharded_rescore=False,
                     has_mask=False):
    fn = functools.partial(
        _local_probe_merge, p=p, k_local=k_local, k_final=k_final, kk=kk,
        sharded_rescore=sharded_rescore, has_mask=has_mask,
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None),  # centroids
            P(SHARD_AXIS),  # centroid liveness
            P(SHARD_AXIS, None, None),  # lists
            P(SHARD_AXIS, None),  # list_ids
            P(SHARD_AXIS, None),  # list_valid
            P(SHARD_AXIS, None),  # list_inv (int8 cosine scales)
            P(),  # queries replicated
            P(SHARD_AXIS, None),  # f32 rescore corpus, row-partitioned
            P(SHARD_AXIS),  # rescore corpus 1/norms
            P(),  # filter mask, replicated (indexed by global row id)
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(cent, cent_live, lists, list_ids, list_valid, list_inv, q,
      corpus, corpus_inv, cand_mask)


class DistributedIVFIndex:
    """Mesh-sharded wrapper over a trained IVFIndex.

    Exposes the same search/state surface as IVFIndex so the engine treats
    both uniformly. Construction reshards the packed tensors onto the mesh
    (device-to-device; the single-device copies are dropped)."""

    def __init__(self, mesh: Mesh, ivf, keep_single_device_rescore=True):
        self.mesh = mesh
        self.n = mesh.devices.size
        self.nprobe = ivf.nprobe
        # duplicate centroids from skew splitting: search widens the probe
        # by this many slots (same contract as IVFSnapshot.search)
        self.n_dup = getattr(ivf, "n_dup", 0)
        self.count = ivf.count
        self.pad_len = ivf.pad_len
        self._state = ivf.state_dict()  # host-side, small (no list tensor)

        nlist = int(ivf.centroids.shape[0])
        pad_lists = (-nlist) % self.n
        live = np.ones(nlist + pad_lists, dtype=bool)
        live[nlist:] = False
        cent = ivf.centroids
        lists = ivf._lists
        list_ids = ivf._list_ids
        list_valid = ivf._list_valid
        # int8 lists: per-slot cosine scales travel with their lists; other
        # dtypes get a zeros placeholder (DCE'd in the kernel) so the
        # shard_map signature stays uniform
        list_inv = (
            ivf._list_inv
            if ivf._list_inv is not None
            else jnp.zeros(lists.shape[:2], jnp.float32)
        )
        if pad_lists:
            cent = jnp.pad(cent, ((0, pad_lists), (0, 0)))
            lists = jnp.pad(lists, ((0, pad_lists), (0, 0), (0, 0)))
            list_ids = jnp.pad(list_ids, ((0, pad_lists), (0, 0)))
            list_valid = jnp.pad(list_valid, ((0, pad_lists), (0, 0)))
            list_inv = jnp.pad(list_inv, ((0, pad_lists), (0, 0)))
        sh2 = NamedSharding(mesh, P(SHARD_AXIS, None))
        sh3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
        sh1 = NamedSharding(mesh, P(SHARD_AXIS))
        self.nlist = nlist
        self._local_lists = (nlist + pad_lists) // self.n
        self._sh2 = sh2
        self._cent = jax.device_put(cent, sh2)
        self._cent_live = jax.device_put(jnp.asarray(live), sh1)
        self._list_inv = jax.device_put(list_inv, sh2)
        # f32 corpus refs for the post-merge exact rescore of quantized
        # candidates. keep_single_device_rescore=True retains the store's
        # single-device buffer (gathers are B x K' rows). The engine passes
        # False when its distributed exact-scan buffer is f32: snapshots
        # then REQUIRE attach_sharded_rescore (the rescore runs against the
        # row-partitioned corpus inside the probe program) and no chip holds
        # a full f32 corpus copy — the store's build-time buffer is freed.
        self._quantized = lists.dtype != jnp.float32
        if keep_single_device_rescore or not self._quantized:
            self._data = ivf._data
            self._inv_norms = ivf._inv_norms
        else:
            self._data = None
            self._inv_norms = None
        # padded HOST copies of the slot tables: deletes remap these with
        # pure int32 work and re-upload only the two small tables — the big
        # sharded list tensor never moves (round-3, VERDICT #7)
        self._ids_host = np.asarray(list_ids)
        self._valid_host = np.asarray(list_valid)
        lists_dev = jax.device_put(lists, sh3)
        ids_dev = jax.device_put(list_ids, sh2)
        valid_dev = jax.device_put(list_valid, sh2)
        # single-attribute tuple swapped wholesale on delete, so a snapshot
        # taken under the engine lock reads one consistent table version
        self._tables = (lists_dev, ids_dev, valid_dev)
        # free the single-device copies (state_dict already captured layout)
        ivf._lists = None
        ivf._list_ids = None
        ivf._list_valid = None

    def state_dict(self) -> dict:
        return self._state

    def refresh_corpus(self, data, inv_norms) -> None:
        """Same contract as IVFIndex.refresh_corpus: rebind the rescore
        corpus to the post-compaction buffer after a delete's id remap."""
        if self._quantized and self._data is not None:
            self._data = data
            self._inv_norms = inv_norms

    def delete_rows(self, rows) -> int:
        """Tombstone + remap, mesh edition: same id-table semantics as
        IVFIndex.delete_rows (ops/ivf.py), but the remapped tables are
        re-uploaded sharded while the trained centroids AND the packed list
        tensor stay resident across the mesh — a delete costs O(tables), not
        a k-means rebuild + reshard."""
        ids, valid, n_del = _remap_ids_for_deletes(
            self._ids_host, self._valid_host, rows, self.count
        )
        if n_del:
            self._ids_host = ids
            self._valid_host = valid
            ids_dev = jax.device_put(jnp.asarray(ids), self._sh2)
            valid_dev = jax.device_put(jnp.asarray(valid), self._sh2)
            self._tables = (self._tables[0], ids_dev, valid_dev)
            self.count -= n_del
            # keep the persisted layout in sync (unpadded list rows)
            self._state["list_ids"] = ids[: self._state["list_ids"].shape[0]]
            self._state["list_valid"] = valid[
                : self._state["list_valid"].shape[0]
            ]
            self._state["count"] = self.count
        return n_del

    def snapshot(self) -> "DistIVFSnapshot":
        """Frozen searchable view (captured under the engine lock): deletes
        swap self._tables wholesale, so the snapshot's tuple reference stays
        internally consistent while the scan runs outside the lock."""
        return DistIVFSnapshot(self)

    def search(self, queries: np.ndarray, k: int, nprobe: int | None = None,
               fetch: bool = True):
        return self.snapshot().search(queries, k, nprobe, fetch=fetch)


class DistIVFSnapshot:
    __slots__ = ("mesh", "cent", "cent_live", "tables", "count", "nprobe",
                 "nlist", "pad_len", "local_lists", "n", "list_inv", "data",
                 "inv_norms", "quantized", "rescore_src", "n_dup")

    def __init__(self, owner: "DistributedIVFIndex"):
        self.mesh = owner.mesh
        self.cent = owner._cent
        self.cent_live = owner._cent_live
        self.tables = owner._tables
        self.count = owner.count
        self.nprobe = owner.nprobe
        self.n_dup = owner.n_dup
        self.nlist = owner.nlist
        self.pad_len = owner.pad_len
        self.local_lists = owner._local_lists
        self.n = owner.n
        self.list_inv = owner._list_inv
        self.data = owner._data
        self.inv_norms = owner._inv_norms
        self.quantized = owner._quantized
        self.rescore_src = None

    def attach_sharded_rescore(self, dist_snap) -> bool:
        """Bind a parallel.dist_scan.DistSnapshot as the exact-rescore
        corpus: the rescore stage then runs row-partitioned inside the probe
        program (see _local_probe_merge) instead of gathering from a
        single-device corpus copy. Holding the snapshot also registers its
        weakref with the owning DistributedScanIndex, so an incremental
        corpus update cannot donate the sharded buffer out from under a
        search in flight (same discipline as core/store.py:pin).

        Returns False (no-op) when the snapshot cannot serve: non-f32
        buffer (the rescore must be exact), a different mesh, or a buffer
        that does not cover every candidate row id."""
        if (
            not self.quantized
            or dist_snap is None
            or dist_snap.mesh is not self.mesh
            or dist_snap.buf.dtype != jnp.float32
            or dist_snap.count < self.count
        ):
            return False
        self.rescore_src = dist_snap
        return True

    def search(self, queries: np.ndarray, k: int, nprobe: int | None = None,
               fetch: bool = True, mask_dev=None, mask_frac: float = 1.0):
        """fetch=False returns DEVICE arrays (no result transfer) so async
        callers can pipeline dispatches — see IVFSnapshot.search.

        mask_dev/mask_frac: same contract as IVFSnapshot.search — the merged
        candidate list is overfetched by ~1/mask_frac and ineligible global
        rows are sentinel-masked before the final cut (list ids are GLOBAL
        row ids on every shard, so one mask array covers the whole mesh)."""
        nprobe = self.nprobe if nprobe is None else nprobe
        # scale by the skew-split factor so nprobe keeps counting distinct
        # trained clusters ("nprobe = nlist is exact" contract, same
        # formula as IVFSnapshot.search)
        distinct = max(1, self.nlist - self.n_dup)
        nprobe = min(-(-nprobe * self.nlist // distinct), self.nlist)
        p = min(self.local_lists, -(-nprobe // self.n))  # ceil
        q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
        kk = min(k, self.count)
        if kk <= 0:
            b = int(np.asarray(queries).reshape(-1, queries.shape[-1]).shape[0])
            return (np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32))
        if mask_dev is not None:
            from minivectordb_tpu.ops.ivf import masked_overfetch_width

            kk_eff = masked_overfetch_width(kk, mask_frac, self.count)
        else:
            kk_eff = kk
        # quantized lists: widen the merged candidate list and rescore it
        # exactly, same two-stage contract as IVFSnapshot.search. With an
        # attached distributed scan snapshot the rescore runs ROW-SHARDED
        # inside the probe program; otherwise it gathers from the retained
        # single-device corpus.
        sharded = self.quantized and self.rescore_src is not None
        rescore = self.quantized and (sharded or self.data is not None)
        if self.quantized and not rescore:
            raise RuntimeError(
                "quantized mesh IVF index holds no rescore corpus: it was "
                "built for sharded rescore (keep_single_device_rescore="
                "False) — attach_sharded_rescore(dist_snapshot) before "
                "searching"
            )
        if rescore:
            kwide = _rescore_kwide(kk_eff, self.tables[0].dtype)
        elif mask_dev is not None:
            kwide = kk_eff
        else:
            kwide = kk
        k_local = min(kwide, p * self.pad_len)
        lists, list_ids, list_valid = self.tables
        has_mask = mask_dev is not None
        if sharded:
            src_buf = self.rescore_src.buf
            src_inv = self.rescore_src.inv_norms
        else:
            # placeholder corpus operands (DCE'd by the program)
            src_buf = jnp.zeros((self.n, 1), jnp.float32)
            src_inv = jnp.zeros((self.n,), jnp.float32)
        vals, ids = _dist_ivf_search(
            self.mesh,
            self.cent,
            self.cent_live,
            lists,
            list_ids,
            list_valid,
            self.list_inv,
            q,
            src_buf,
            src_inv,
            mask_dev
            if (has_mask and sharded)
            else jnp.zeros((1,), jnp.bool_),  # placeholder (DCE'd)
            p,
            k_local,
            kwide,
            # kk is consumed only inside the sharded-rescore branch; a fixed
            # placeholder otherwise keeps distinct requested k values (whose
            # pow2-bucketed kwide coincides) on ONE compiled program, since
            # kk is a static argname
            kk if sharded else 0,
            sharded_rescore=sharded,
            has_mask=has_mask and sharded,
        )
        if not sharded:
            if has_mask:
                from minivectordb_tpu.ops.ivf import _mask_scores

                # sentinel-mask ineligible candidates BEFORE the rescore cut
                vals = _mask_scores(mask_dev, vals, ids)
            if rescore:
                from minivectordb_tpu.ops.ivf import _exact_rescore

                vals, ids = _exact_rescore(
                    self.data, self.inv_norms, q, vals, ids, kk
                )
            elif has_mask:
                from minivectordb_tpu.ops.ivf import _select_topk

                vals, ids = _select_topk(
                    vals, ids, min(kk, int(vals.shape[1]))
                )
        if not fetch:
            return vals[:, :kk], ids[:, :kk]
        from minivectordb_tpu.ops.scan import fetch_results

        return fetch_results(vals[:, :kk], ids[:, :kk])
