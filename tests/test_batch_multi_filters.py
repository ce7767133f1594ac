"""Per-query filters on the batch search API (search_batch_multi).

Queries sharing a filter must collapse into one dispatch; results must
match per-query single searches exactly, in input order.
"""

import numpy as np
import pytest

from minivectordb_tpu.vector_database import VectorDatabase


@pytest.fixture
def db(tmp_path):
    db = VectorDatabase(storage_file=str(tmp_path / "m.pkl"))
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((128, 16)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(128)), list(mat),
        [{"grp": int(i % 4), "even": bool(i % 2 == 0)} for i in range(128)],
    )
    db._mat = mat
    return db


def test_per_query_filters_match_single_searches(db):
    rng = np.random.default_rng(1)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    filters = [{"grp": 0}, {"grp": 1}, None, {"grp": 0},
               {"even": True}, {"grp": {"$gte": 2}}]
    batch = db.find_most_similar_batch(q, k=4, metadata_filters=filters)
    assert len(batch) == 6
    for i, f in enumerate(filters):
        single = db.find_most_similar(q[i], k=4, metadata_filter=f)
        assert list(batch[i][0]) == list(single[0]), f"query {i} filter {f}"
        np.testing.assert_allclose(
            np.asarray(batch[i][1], np.float32),
            np.asarray(single[1], np.float32), rtol=1e-5, atol=1e-6,
        )


def test_shared_filters_group_into_one_dispatch(db):
    eng = db._engine
    calls = []
    orig = eng._scan

    def spy(q, *a, **kw):
        calls.append(np.shape(q)[0])
        return orig(q, *a, **kw)

    eng._scan = spy
    q = np.random.default_rng(2).standard_normal((8, 16)).astype(np.float32)
    filters = [{"grp": 0}] * 5 + [{"grp": 1}] * 3
    db.find_most_similar_batch(q, k=3, metadata_filters=filters)
    assert sorted(calls) == [3, 5]  # two dispatches, grouped by filter


def test_empty_result_queries_and_order(db):
    q = np.random.default_rng(3).standard_normal((3, 16)).astype(np.float32)
    filters = [{"grp": 99}, None, {"grp": 2}]  # first matches nothing
    out = db.find_most_similar_batch(q, k=3, metadata_filters=filters)
    assert out[0] == ([], [], [])
    assert len(out[1][0]) == 3
    assert all(m["grp"] == 2 for m in out[2][2])


def test_mutual_exclusion_with_shared_filters(db):
    q = np.zeros((2, 16), np.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        db.find_most_similar_batch(
            q, k=2, metadata_filter={"grp": 0},
            metadata_filters=[{"grp": 0}, None],
        )
    with pytest.raises(ValueError, match="one entry per query"):
        db.find_most_similar_batch(q, k=2, metadata_filters=[{"grp": 0}])


def test_sharded_per_query_filters(tmp_path):
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    sdb = ShardedVectorDatabase(storage_dir=str(tmp_path / "sh"), shard_size=32)
    rng = np.random.default_rng(4)
    mat = rng.standard_normal((64, 16)).astype(np.float32)
    sdb.store_embeddings_batch(
        [f"u{i}" for i in range(64)], list(mat),
        [{"grp": int(i % 2)} for i in range(64)],
    )
    q = rng.standard_normal((2, 16)).astype(np.float32)
    out = sdb.find_most_similar_batch(
        q, k=3, metadata_filters=[{"grp": 0}, {"grp": 1}]
    )
    assert all(m["grp"] == 0 for m in out[0][2])
    assert all(m["grp"] == 1 for m in out[1][2])
