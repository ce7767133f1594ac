"""Host BLAS scan fallback for small corpora (round-3, VERDICT #3).

Small-batch searches over small corpora route to a numpy/BLAS scan instead
of a device dispatch; an adaptive router times both paths and keeps the
winner. These tests pin host/device parity, the copy-on-write guarantee for
snapshots held across deletes, and the router's probe schedule.
"""

import numpy as np
import pytest

from minivectordb_tpu.core import store as store_mod
from minivectordb_tpu.core.store import VectorStore, _ScanRouter


def _corpus(n=300, d=32, seed=3):
    return np.random.default_rng(seed).standard_normal((n, d)).astype(np.float32)


def test_host_and_device_paths_agree():
    mat = _corpus()
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    q = mat[:4] + 0.01
    hv, hi = snap._host_search(q, 7, None)
    dv, di = snap._device_search(q, 7, None)
    np.testing.assert_array_equal(hi, di)
    np.testing.assert_allclose(hv, dv, rtol=1e-5, atol=1e-6)


def test_host_and_device_paths_agree_masked():
    mat = _corpus()
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    mask = np.zeros(mat.shape[0], dtype=bool)
    mask[::3] = True
    q = mat[:2]
    hv, hi = snap._host_search(q, 5, mask)
    dv, di = snap._device_search(q, 5, mask)
    np.testing.assert_array_equal(hi, di)
    np.testing.assert_allclose(hv, dv, rtol=1e-5, atol=1e-6)
    assert all(mask[i] for i in hi.ravel())


def test_host_pads_invalid_slots_like_device():
    mat = _corpus(n=3)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    vals, idx = snap._host_search(mat[:1], 8, None)
    assert vals.shape == (1, 8)
    assert (vals[0, 3:] < -1.0e38).all()  # callers drop these


def test_small_corpus_routes_to_host_without_device_probe():
    mat = _corpus(n=100)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    for _ in range(20):
        snap.search(mat[:1], 3)
    # under _HOST_ALWAYS_BYTES nothing should ever have been timed/probed
    assert st.router.n == 0
    assert st.router.dev_ema is None


def test_snapshot_survives_delete_compaction_cow():
    mat = _corpus(n=200)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    before = snap._host_search(mat[5:6], 1, None)
    st.delete_rows(list(range(0, 100)))  # shifts rows in the live store
    after = snap._host_search(mat[5:6], 1, None)
    np.testing.assert_array_equal(before[1], after[1])
    np.testing.assert_allclose(before[0], after[0])
    # live store answers with the compacted rows
    fresh = st.snapshot()._host_search(mat[5:6], 1, None)
    assert fresh[1][0, 0] != before[1][0, 0] or st.count == 100


def test_snapshot_survives_replace_row_cow():
    mat = _corpus(n=50)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    v0, i0 = snap._host_search(mat[7:8], 1, None)
    st.replace_row(7, -mat[7])
    v1, i1 = snap._host_search(mat[7:8], 1, None)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1)


def test_router_probe_schedule():
    r = _ScanRouter()
    # first call host; device probe deferred past _ROUTER_FIRST_PROBE
    assert r.choose() == "host"
    r.record("host", 0.001)
    choices = [r.choose() for _ in range(store_mod._ROUTER_FIRST_PROBE)]
    assert choices[:-1] == ["host"] * (store_mod._ROUTER_FIRST_PROBE - 1)
    # the device path is primed by a BACKGROUND probe ("probe" tells the
    # caller to launch it and serve this query from the host); while the
    # probe is in flight the router keeps choosing host
    assert choices[-1] == "probe"
    r.warming = True
    assert r.choose() == "host"
    r.warming = False
    r.record("device", 0.050)
    # host is faster -> serves; periodic refresh re-probes device
    n_dev = sum(
        1 for _ in range(store_mod._ROUTER_REFRESH_EVERY * 2)
        if r.choose() == "device"
    )
    assert n_dev == 2


def test_host_scan_disabled_via_env(monkeypatch):
    monkeypatch.setattr(store_mod, "_HOST_SCAN_MAX_BYTES", 0)
    mat = _corpus(n=64)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    assert not snap._host_eligible("exact", 1)


def test_int8_store_never_host_routes():
    mat = _corpus(n=64)
    st = VectorStore(mat.shape[1], device_dtype="int8")
    st.append(mat)
    snap = st.snapshot()
    assert not snap._host_eligible("exact", 1)


def test_large_batch_stays_on_device():
    mat = _corpus(n=64)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    assert not snap._host_eligible("exact", store_mod._HOST_SCAN_MAX_BATCH + 1)


# -- gathered-submatrix host scan for selective filters -----------------------


def _sub_thunk(mask):
    """Engine-shaped thunk: gather passing rows from the snapshot arrays."""
    def thunk(host_data, host_norms):
        rows = np.flatnonzero(mask).astype(np.int32)
        return rows, np.ascontiguousarray(host_data[rows]), host_norms[rows]
    return thunk


def test_host_sub_scan_matches_masked_full_scan():
    mat = _corpus(n=400)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    mask = np.zeros(mat.shape[0], dtype=bool)
    mask[::7] = True
    q = mat[:3] + 0.01
    fv, fi = snap._host_search(q, 5, mask)
    sv, si = snap._host_search(q, 5, mask, host_sub=_sub_thunk(mask))
    np.testing.assert_array_equal(si, fi)
    np.testing.assert_allclose(sv, fv, rtol=1e-5, atol=1e-6)
    assert all(mask[i] for i in si.ravel())


def test_host_sub_scan_pads_when_fewer_candidates_than_k():
    mat = _corpus(n=50)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    mask = np.zeros(mat.shape[0], dtype=bool)
    mask[[4, 9]] = True
    vals, idx = snap._host_search(mat[:1], 6, mask, host_sub=_sub_thunk(mask))
    assert vals.shape == (1, 6)
    assert (vals[0, 2:] < -1.0e38).all()
    assert set(idx[0, :2].tolist()) == {4, 9}


def test_host_sub_thunk_returning_none_falls_back_to_masked_scan():
    mat = _corpus(n=120)
    st = VectorStore(mat.shape[1])
    st.append(mat)
    snap = st.snapshot()
    mask = np.zeros(mat.shape[0], dtype=bool)
    mask[::2] = True
    fv, fi = snap._host_search(mat[:2], 4, mask)
    sv, si = snap._host_search(mat[:2], 4, mask,
                               host_sub=lambda d, n: None)
    np.testing.assert_array_equal(si, fi)
    np.testing.assert_allclose(sv, fv)


def test_engine_host_sub_cache_reused_and_invalidated(tmp_path):
    """Repeated selective filters hit one gathered submatrix; a write
    invalidates it (version check) and the next search rebuilds."""
    from minivectordb_tpu.vector_database import VectorDatabase

    rng = np.random.default_rng(11)
    db = VectorDatabase(storage_file=str(tmp_path / "hs.pkl"))
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(n)), list(mat), [{"cat": i % 10} for i in range(n)]
    )
    eng = db._engine
    filt = {"cat": {"$lt": 2}}  # 20% selectivity
    ids, _, metas = db.find_most_similar(mat[0], metadata_filter=filt, k=5)
    assert ids[0] == 0 and all(m["cat"] < 2 for m in metas)
    assert len(eng._host_sub_cache) == 1
    ((ver0, (rows0, sub0, _), _),) = list(eng._host_sub_cache.values())
    assert rows0.shape[0] == sub0.shape[0] == sum(
        1 for i in range(n) if i % 10 < 2
    )
    ids2, _, _ = db.find_most_similar(mat[10], metadata_filter=filt, k=5)
    (ent,) = eng._host_sub_cache.values()
    assert ent[1][0] is rows0  # same gathered arrays: cache hit

    db.store_embedding("new", rng.standard_normal(d), {"cat": 1})
    ids3, _, metas3 = db.find_most_similar(mat[0], metadata_filter=filt, k=5)
    assert all(m["cat"] < 2 for m in metas3)
    (ent2,) = eng._host_sub_cache.values()
    assert ent2[0] != ver0  # rebuilt at the new version


def test_engine_skips_host_sub_for_broad_filters(tmp_path):
    from minivectordb_tpu.vector_database import VectorDatabase

    rng = np.random.default_rng(12)
    db = VectorDatabase(storage_file=str(tmp_path / "hb.pkl"))
    n, d = 200, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(n)), list(mat), [{"flag": bool(i % 2)} for i in range(n)]
    )
    db.find_most_similar(mat[0], metadata_filter={"flag": True}, k=5)
    assert not db._engine._host_sub_cache  # 50% passes: gather has no edge


def test_host_sub_cache_lru_and_aggregate_byte_bound(tmp_path, monkeypatch):
    """ADVICE r3: eviction must be LRU (a hit refreshes recency, so the
    hottest key survives alternating filters) and the cache must bound
    aggregate bytes, not just entry count."""
    from minivectordb_tpu.core import engine as engine_mod
    from minivectordb_tpu.filters.engine import filters_cache_key
    from minivectordb_tpu.vector_database import VectorDatabase

    rng = np.random.default_rng(13)
    db = VectorDatabase(storage_file=str(tmp_path / "lru.pkl"))
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(n)), list(mat), [{"cat": i % 10} for i in range(n)]
    )
    eng = db._engine
    monkeypatch.setattr(engine_mod, "_HOST_SUB_CACHE_MAX", 2)
    filt = lambda c: {"cat": c}  # noqa: E731 — 10% selectivity each

    db.find_most_similar(mat[0], metadata_filter=filt(0), k=3)
    db.find_most_similar(mat[0], metadata_filter=filt(1), k=3)
    assert len(eng._host_sub_cache) == 2
    # hit cat=0: refreshes its recency, so inserting cat=2 evicts cat=1
    db.find_most_similar(mat[1], metadata_filter=filt(0), k=3)
    db.find_most_similar(mat[0], metadata_filter=filt(2), k=3)
    keys = set(eng._host_sub_cache)
    assert filters_cache_key(filt(0), None, None) in keys
    assert filters_cache_key(filt(1), None, None) not in keys
    assert filters_cache_key(filt(2), None, None) in keys

    # aggregate byte bound: room for only one gathered copy -> the cache
    # never holds two entries even though the count limit allows it
    one_entry = next(iter(eng._host_sub_cache.values()))[2]
    monkeypatch.setattr(
        engine_mod, "_HOST_SUB_TOTAL_BYTES", int(one_entry * 1.5)
    )
    eng._host_sub_cache.clear()
    db.find_most_similar(mat[0], metadata_filter=filt(3), k=3)
    db.find_most_similar(mat[0], metadata_filter=filt(4), k=3)
    assert len(eng._host_sub_cache) == 1
    assert filters_cache_key(filt(4), None, None) in eng._host_sub_cache
