"""Regression tests for the round-3 self-review findings (mask-cache
eviction race, router inf recovery, weakref accumulation, naive-datetime
encoding, multihost block validation, async IVF pipelining)."""

import datetime
import os
import time

import numpy as np
import pytest

from minivectordb_tpu.core.store import VectorStore, _ScanRouter
from minivectordb_tpu.filters.engine import _classify, _NAIVE_EPOCH


# -- router: failed device probe must not route user calls to the device ----

def test_router_inf_dev_ema_serves_host_and_reprobes():
    r = _ScanRouter()
    r.host_ema = 0.001
    r.dev_ema = float("inf")
    choices = [r.choose() for _ in range(600)]
    assert "device" not in choices  # never a user call on the failing path
    assert "probe" in choices  # but the link is re-probed in the background


def test_router_record_replaces_inf_on_recovery():
    r = _ScanRouter()
    r.dev_ema = float("inf")
    r.record("device", 0.002)
    assert r.dev_ema == pytest.approx(0.002)  # not inf-poisoned


def test_router_record_replaces_none():
    r = _ScanRouter()
    r.record("host", 0.5)
    assert r.host_ema == pytest.approx(0.5)
    r.record("host", 0.1)
    assert 0.1 < r.host_ema < 0.5  # EMA blending once primed


# -- store: snapshot weakrefs must not accumulate on read-only workloads ----

def test_snapshot_weakrefs_pruned_without_mutations():
    st = VectorStore(8)
    st.append(np.ones((4, 8), dtype=np.float32))
    for _ in range(500):
        snap = st.snapshot()
        del snap
    assert len(st._snap_refs) < 50
    assert len(st._host_snap_refs) < 50


# -- filters: naive datetimes encode TZ-independently ----------------------

def test_naive_datetime_encoding_is_tz_independent_and_monotone():
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        # 2026-03-08 02:30 does not exist on the US East Coast wall clock
        # (DST spring-forward); .timestamp() would collapse it onto 03:30
        inside_gap = datetime.datetime(2026, 3, 8, 2, 30)
        after_gap = datetime.datetime(2026, 3, 8, 3, 0)
        k1, e1 = _classify(inside_gap)
        k2, e2 = _classify(after_gap)
        assert k1 == k2 == "dt_naive"
        assert e1 < e2  # matches Python's naive ordering
        assert e2 - e1 == pytest.approx(1800.0)  # exactly 30 wall minutes
        # and pre-epoch naive datetimes encode without OS help
        k3, e3 = _classify(datetime.datetime(1950, 1, 1))
        assert k3 == "dt_naive" and e3 < 0
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_naive_datetime_range_filter_spans_dst_gap(tmp_path):
    from minivectordb_tpu.vector_database import VectorDatabase

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        db = VectorDatabase(storage_file=str(tmp_path / "dt.pkl"))
        rng = np.random.default_rng(0)
        stamps = [
            datetime.datetime(2026, 3, 8, 1, 30),
            datetime.datetime(2026, 3, 8, 2, 30),  # inside the local DST gap
            datetime.datetime(2026, 3, 8, 3, 30),
        ]
        for i, ts in enumerate(stamps):
            db.store_embedding(
                i, rng.standard_normal(16).astype(np.float32), {"ts": ts}
            )
        q = rng.standard_normal(16).astype(np.float32)
        ids, _, _ = db.find_most_similar(
            q, k=3,
            metadata_filter={"ts": {"$lt": datetime.datetime(2026, 3, 8, 3, 0)}},
        )
        assert sorted(ids) == [0, 1]  # 02:30 is strictly before 03:00
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


# -- multihost: block placement contract is validated -----------------------

def test_pod_load_local_rejects_wrong_offset_and_short_block():
    import jax

    from minivectordb_tpu.parallel.mesh import pod_mesh
    from minivectordb_tpu.parallel.multihost import PodScanIndex

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    mesh = pod_mesh(2, 2)
    idx = PodScanIndex(mesh, 8)
    rng = np.random.default_rng(1)
    # single-process: this process is process 0, so row_offset must be 0
    with pytest.raises(ValueError, match="process_index"):
        idx.load_local(rng.standard_normal((512, 8)), 512, 1024)
    # a short block below global_count would leave phantom zero rows
    with pytest.raises(ValueError, match="dense share"):
        idx.load_local(rng.standard_normal((100, 8)), 0, 2000)


# -- async IVF search: pipelined handles, same results as sync --------------

def test_ivf_async_batch_matches_sync(tmp_path):
    from minivectordb_tpu.vector_database import VectorDatabase

    db = VectorDatabase(
        storage_file=str(tmp_path / "ivf.pkl"), index="ivf",
        ivf_opts={"build_threshold": 256, "nlist": 16, "nprobe": 16},
    )
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((400, 32)).astype(np.float32)
    db.store_embeddings_batch(list(range(400)), list(mat),
                              [{"i": i} for i in range(400)])
    db.find_most_similar(mat[0], k=3)  # trigger the IVF build
    # overflow rows on top of the built index exercise the merge path
    extra = rng.standard_normal((20, 32)).astype(np.float32)
    db.store_embeddings_batch([1000 + i for i in range(20)], list(extra))
    q = mat[:8] + 0.01
    sync_res = db.find_most_similar_batch(q, k=5)
    handle = db.find_most_similar_batch_async(q, k=5)
    async_res = handle.result()
    for s, a in zip(sync_res, async_res):
        assert list(s[0]) == list(a[0])
        np.testing.assert_allclose(
            np.asarray(s[1], np.float32), np.asarray(a[1], np.float32),
            rtol=1e-5, atol=1e-6,
        )


# -- second review pass ------------------------------------------------------

def test_nprobe_accepts_numpy_ints_rejects_bool(tmp_path):
    from minivectordb_tpu.vector_database import VectorDatabase

    db = VectorDatabase(
        storage_file=str(tmp_path / "np.pkl"), index="ivf",
        ivf_opts={"build_threshold": 32, "nlist": 4, "nprobe": 4},
    )
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((64, 8)).astype(np.float32)
    db.store_embeddings_batch(list(range(64)), list(mat))
    ids, _, _ = db.find_most_similar(mat[0], k=3, nprobe=np.int64(4))
    assert ids[0] == 0
    for bad in (True, 1.5, "4"):
        with pytest.raises(ValueError):
            db.find_most_similar(mat[0], k=3, nprobe=bad)


def test_average_pool_all_zero_mask_no_nan():
    from minivectordb_tpu.embedding_model import EmbeddingModel

    m = EmbeddingModel()
    h = np.ones((2, 4, 8), dtype=np.float32)
    mask = np.array([[1, 1, 0, 0], [0, 0, 0, 0]], np.int32)
    out = m.average_pool(h, mask)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], np.ones(8), atol=1e-6)
    np.testing.assert_allclose(out[1], np.zeros(8), atol=1e-6)


def test_multi_filter_batch_snapshot_consistent_under_writers(tmp_path):
    """All groups of one metadata_filters batch answer from one corpus
    version even with a racing writer (the group loop holds the lock)."""
    import threading

    from minivectordb_tpu.vector_database import VectorDatabase

    db = VectorDatabase(storage_file=str(tmp_path / "sc.pkl"))
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((64, 8)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(64)), list(mat), [{"g": i % 2} for i in range(64)]
    )
    stop = threading.Event()
    errors = []

    def writer():
        uid = 1000
        r = np.random.default_rng(2)
        while not stop.is_set():
            db.store_embedding(uid, r.standard_normal(8).astype(np.float32),
                               {"g": uid % 2, "probe": True})
            uid += 1

    eng = db._engine
    orig_scan = eng._scan
    versions_per_call: list = []

    def spy(q2, *a, **kw):
        versions_per_call.append(eng._version)
        return orig_scan(q2, *a, **kw)

    eng._scan = spy
    t = threading.Thread(target=writer)
    t.start()
    try:
        q = rng.standard_normal((4, 8)).astype(np.float32)
        for _ in range(50):
            versions_per_call.clear()
            out = db.find_most_similar_batch(
                q, k=64,
                metadata_filters=[{"g": 0}, {"g": 1}, {"g": 0}, {"g": 1}],
            )
            assert len(out) == 4
            # both group dispatches must capture the SAME corpus version
            # (the group loop holds the engine lock)
            assert len(set(versions_per_call)) == 1, versions_per_call
    except Exception as e:  # noqa: BLE001
        errors.append(e)
    finally:
        stop.set()
        t.join()
    assert not errors, errors
