"""Device-resident filter-mask cache.

Repeated filtered searches previously re-uploaded a dev_capacity-wide bool
mask per call (~1 MB at 1M rows through the link); the engine now caches the
padded device array per (filter key, corpus version, capacity) and hands the
store a lazy thunk, so host-routed calls never pay the upload at all.
"""

import numpy as np
import pytest

from minivectordb_tpu.core import store as store_mod
from minivectordb_tpu.vector_database import VectorDatabase


@pytest.fixture
def db(tmp_path, monkeypatch):
    # force the device path (host routing would bypass mask upload entirely)
    monkeypatch.setattr(store_mod, "_HOST_SCAN_MAX_BYTES", 0)
    db = VectorDatabase(storage_file=str(tmp_path / "m.pkl"))
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((64, 16)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(64)), list(mat),
        [{"grp": "a" if i % 2 else "b"} for i in range(64)],
    )
    return db


def test_repeated_filter_reuses_device_mask(db):
    q = np.random.default_rng(0).standard_normal(16).astype(np.float32)
    eng = db._engine
    ids1, _, metas1 = db.find_most_similar(q, k=5, metadata_filter={"grp": "a"})
    assert len(eng._dev_mask_cache) == 1
    arr1 = next(iter(eng._dev_mask_cache.values()))[2]
    ids2, _, _ = db.find_most_similar(q, k=5, metadata_filter={"grp": "a"})
    arr2 = next(iter(eng._dev_mask_cache.values()))[2]
    assert arr2 is arr1  # same device array, no re-upload
    assert list(ids1) == list(ids2)
    assert all(m["grp"] == "a" for m in metas1)


def test_mutation_invalidates_device_mask(db):
    q = np.random.default_rng(1).standard_normal(16).astype(np.float32)
    eng = db._engine
    db.find_most_similar(q, k=5, metadata_filter={"grp": "a"})
    v1, _, arr1 = next(iter(eng._dev_mask_cache.values()))
    new = np.random.default_rng(2).standard_normal(16).astype(np.float32)
    db.store_embedding(999, new, {"grp": "a"})
    ids, _, metas = db.find_most_similar(new, k=1, metadata_filter={"grp": "a"})
    assert ids[0] == 999  # the new row is visible through the cached filter
    v2, _, arr2 = next(iter(eng._dev_mask_cache.values()))
    assert (v2, arr2 is arr1) != (v1, True)


def test_distinct_filters_get_distinct_entries(db):
    q = np.random.default_rng(3).standard_normal(16).astype(np.float32)
    eng = db._engine
    _, _, ma = db.find_most_similar(q, k=3, metadata_filter={"grp": "a"})
    _, _, mb = db.find_most_similar(q, k=3, metadata_filter={"grp": "b"})
    assert len(eng._dev_mask_cache) == 2
    assert all(m["grp"] == "a" for m in ma)
    assert all(m["grp"] == "b" for m in mb)


def test_filtered_results_match_host_oracle(db):
    """Device-masked top-k equals a numpy oracle over the filtered rows."""
    q = np.random.default_rng(4).standard_normal(16).astype(np.float32)
    ids, scores, _ = db.find_most_similar(q, k=5, metadata_filter={"grp": "a"})
    eng = db._engine
    rows = eng.store.view()
    qn = q / np.linalg.norm(q)
    sims = rows @ qn / np.maximum(np.linalg.norm(rows, axis=1), 1e-30)
    keep = np.array([m["grp"] == "a" for m in eng.metadata])
    sims[~keep] = -np.inf
    oracle = np.argsort(-sims)[:5]
    assert list(ids) == [eng.uids[r] for r in oracle]
