"""Vectorized operator filters (round-3, VERDICT weak-5 / next-round #4).

The engine maintains row-aligned float64 columns per metadata key; operator
dicts ($gt/$gte/$lt/$lte/$ne) evaluate as numpy broadcast compares instead of
the reference's Python loop over the posting list (reference
vector_database.py:238-318). These tests pin:

1. exact parity between the columnar fast path and the Python fallback
   (randomized values, every operator, multi-op range dicts),
2. the fallback triggers (mixed kinds, huge ints, naive-vs-aware datetime
   mismatch, $in, unknown ops) with reference-matching error behavior,
3. column maintenance across delete-compaction and persistence reload,
4. a cold 200k-row range query stays well under the Python-loop regime.
"""

import datetime
import time
import uuid

import numpy as np
import pytest

from minivectordb_tpu.filters.engine import (
    ColumnStore,
    FilterContext,
    MetadataIndex,
    select_rows,
)
from minivectordb_tpu.vector_database import VectorDatabase


def _ctx(mds, with_columns=True):
    mi = MetadataIndex()
    for i, md in enumerate(mds):
        mi.add(i, md)
    cs = None
    if with_columns:
        cs = ColumnStore()
        cs.append_many(mds)
    inv = {i: i for i in range(len(mds))}
    return FilterContext(mi, inv, mds, cs)


def _rows(ctx, **kw):
    sel = select_rows(ctx, **kw)
    n = len(ctx.metadata_of_row)
    if sel.rows is None:
        return set(range(n)) - sel.excluded
    return sel.to_set()


def test_columnar_matches_fallback_randomized():
    rng = np.random.default_rng(7)
    mds = []
    for i in range(500):
        md = {"x": float(rng.standard_normal())}
        if i % 3:
            md["y"] = int(rng.integers(-50, 50))
        mds.append(md)
    fast, slow = _ctx(mds, True), _ctx(mds, False)
    for f in [
        {"x": {"$gt": 0.0}},
        {"x": {"$gte": -0.5, "$lte": 0.5}},
        {"y": {"$lt": 10}},
        {"y": {"$ne": 0}},
        {"x": {"$gt": -1.0}, "y": {"$lte": 25}},
    ]:
        assert _rows(fast, metadata_filter=f) == _rows(slow, metadata_filter=f), f


def test_columnar_or_and_exclude_composition():
    mds = [{"a": i, "b": i % 5} for i in range(100)]
    fast, slow = _ctx(mds, True), _ctx(mds, False)
    kw = dict(
        metadata_filter={"a": {"$gte": 10, "$lt": 80}},
        or_filters=[{"b": {"$lte": 1}}, {"b": 4}],
        exclude_filter=[{"a": 12}],
    )
    got = _rows(fast, **kw)
    assert got == _rows(slow, **kw)
    assert 12 not in got and 11 in got


def test_datetime_columns_naive_and_aware():
    base = datetime.datetime(2024, 1, 1)
    mds = [{"t": base + datetime.timedelta(hours=i)} for i in range(48)]
    fast, slow = _ctx(mds, True), _ctx(mds, False)
    f = {"t": {"$gte": base + datetime.timedelta(hours=10),
               "$lt": base + datetime.timedelta(hours=20)}}
    assert _rows(fast, metadata_filter=f) == _rows(slow, metadata_filter=f) == set(range(10, 20))
    # aware filter value against a naive column: incomparable -> matches
    # NOTHING on both paths (deliberate robustness deviation from the
    # reference, which would propagate operator.ge's TypeError — see
    # filters/engine.py:_match_condition)
    aware = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    f2 = {"t": {"$gte": aware}}
    assert _rows(fast, metadata_filter=f2) == _rows(slow, metadata_filter=f2) == set()


def test_date_columns():
    base = datetime.date(2024, 1, 1)
    mds = [{"d": base + datetime.timedelta(days=i)} for i in range(30)]
    fast, slow = _ctx(mds, True), _ctx(mds, False)
    f = {"d": {"$gt": base + datetime.timedelta(days=14)}}
    assert _rows(fast, metadata_filter=f) == _rows(slow, metadata_filter=f) == set(range(15, 30))


def test_mixed_kind_key_falls_back_and_skips_incomparable_rows():
    mds = [{"v": 1}, {"v": "two"}, {"v": 3}]
    fast = _ctx(mds, True)
    assert fast.columns.columns["v"].kind == "mixed"
    # comparable rows answer exactly; the incomparable 'two' row simply
    # doesn't match (it would TypeError in the reference's raw scan)
    assert _rows(fast, metadata_filter={"v": {"$gt": 2}}) == {2}


def test_huge_int_poisons_column_but_python_path_is_exact():
    big = 2**60 + 1
    mds = [{"v": big}, {"v": big + 1}, {"v": 5}]
    fast = _ctx(mds, True)
    # column unusable (would lose precision); fallback still answers exactly
    assert not fast.columns.columns["v"].usable()
    assert _rows(fast, metadata_filter={"v": {"$gt": big}}) == {1}


def test_bool_and_int_share_the_num_column():
    mds = [{"v": True}, {"v": 0}, {"v": 2.5}]
    fast, slow = _ctx(mds, True), _ctx(mds, False)
    for f in [{"v": {"$gte": 1}}, {"v": {"$ne": True}}]:
        assert _rows(fast, metadata_filter=f) == _rows(slow, metadata_filter=f)


def test_unknown_operator_still_raises_valueerror():
    fast = _ctx([{"v": 1}], True)
    with pytest.raises(ValueError):
        _rows(fast, metadata_filter={"v": {"$bogus": 1}})
    # unknown op on a never-stored key must raise too (reference raises
    # before consulting the posting list, vector_database.py:174-175)
    with pytest.raises(ValueError):
        _rows(fast, metadata_filter={"nokey": {"$bogus": 1}})


def test_missing_key_operator_matches_nothing():
    fast = _ctx([{"v": 1}], True)
    assert _rows(fast, metadata_filter={"nokey": {"$gt": 0}}) == set()


def test_in_operator_unchanged():
    mds = [{"tags": ["a", "b"]}, {"tags": ["c"]}]
    fast, slow = _ctx(mds, True), _ctx(mds, False)
    f = {"tags": {"$in": "a"}}
    assert _rows(fast, metadata_filter=f) == _rows(slow, metadata_filter=f) == {0}


def test_columns_survive_delete_compaction_end_to_end():
    db = VectorDatabase(f"/tmp/colfilter_{uuid.uuid4().hex}.pkl")
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((50, 8)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(50)), mat, [{"rank": i} for i in range(50)]
    )
    for uid in range(0, 50, 2):  # drop even uids (flat DB delete is per-uid)
        db.delete_embedding(uid)
    ids, _, mds = db.find_most_similar(
        mat[1], k=50, metadata_filter={"rank": {"$gte": 30}}
    )
    assert sorted(ids) == list(range(31, 50, 2))
    assert all(md["rank"] >= 30 for md in mds)


def test_columns_rebuilt_on_reload():
    path = f"/tmp/colfilter_{uuid.uuid4().hex}.pkl"
    db = VectorDatabase(path)
    mat = np.eye(8, dtype=np.float32)
    db.store_embeddings_batch(list(range(8)), mat, [{"n": i} for i in range(8)])
    db.persist_to_disk()
    db2 = VectorDatabase(path)
    assert db2._engine.columns.count == 8
    ids, _, _ = db2.find_most_similar(mat[0], k=8, metadata_filter={"n": {"$lt": 3}})
    assert sorted(ids) == [0, 1, 2]


def test_cold_range_query_is_vectorized_speed():
    n = 200_000
    vals = np.random.default_rng(1).integers(0, 1000, n)
    mds = [{"p": int(v)} for v in vals]
    ctx = _ctx(mds, True)
    t0 = time.perf_counter()
    sel = select_rows(ctx, metadata_filter={"p": {"$gte": 100, "$lte": 200}})
    mask = sel.to_mask(n)
    elapsed = time.perf_counter() - t0
    assert mask.sum() == ((vals >= 100) & (vals <= 200)).sum()
    # Python-loop regime is ~100ms+ at this size; the columnar path is ~1ms.
    # Generous bound to stay robust on slow CI.
    assert elapsed < 0.05, f"columnar path took {elapsed*1000:.1f}ms"
