"""Serving-side dynamic batching (coalesce_window_ms).

Concurrent single-query searches from different threads must merge into
shared batched dispatches with identical results to the uncoalesced path,
and exceptions must reach every waiter in a failing group.
"""

import threading

import numpy as np
import pytest

from minivectordb_tpu.vector_database import VectorDatabase


@pytest.fixture
def corpus():
    rng = np.random.default_rng(0)
    return rng.standard_normal((200, 16)).astype(np.float32)


def _fill(db, corpus):
    db.store_embeddings_batch(
        list(range(len(corpus))), list(corpus),
        [{"g": int(i % 2)} for i in range(len(corpus))],
    )


def test_coalesced_results_match_direct(tmp_path, corpus):
    ref = VectorDatabase(storage_file=str(tmp_path / "a.pkl"))
    _fill(ref, corpus)
    # large window so even a loaded single-core CI machine staggers all
    # 8 arrivals inside it (the dispatch-count assertion below would
    # otherwise be scheduler-dependent)
    db = VectorDatabase(storage_file=str(tmp_path / "b.pkl"),
                        coalesce_window_ms=50.0)
    _fill(db, corpus)

    eng = db._engine
    batch_calls = []
    orig = eng._scan

    def spy(qs, *a, **kw):
        batch_calls.append(np.shape(qs)[0])
        return orig(qs, *a, **kw)

    eng._scan = spy

    n_threads = 8
    queries = corpus[:n_threads] + 0.01
    results = [None] * n_threads
    barrier = threading.Barrier(n_threads)

    def worker(i):
        barrier.wait()
        results[i] = db.find_most_similar(queries[i], k=5)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(n_threads):
        want = ref.find_most_similar(queries[i], k=5)
        assert list(results[i][0]) == list(want[0]), i
        np.testing.assert_allclose(
            np.asarray(results[i][1], np.float32),
            np.asarray(want[1], np.float32), rtol=1e-5, atol=1e-6,
        )
    # fewer dispatches than callers = coalescing actually happened
    assert sum(batch_calls) == n_threads
    assert len(batch_calls) < n_threads


def test_coalesced_filters_group_separately(tmp_path, corpus):
    db = VectorDatabase(storage_file=str(tmp_path / "c.pkl"),
                        coalesce_window_ms=5.0)
    _fill(db, corpus)
    n = 6
    results = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        results[i] = db.find_most_similar(
            corpus[i], k=4, metadata_filter={"g": i % 2}
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(n):
        assert all(m["g"] == i % 2 for m in results[i][2]), i


def test_coalesced_exception_reaches_every_waiter(tmp_path, corpus):
    db = VectorDatabase(storage_file=str(tmp_path / "d.pkl"),
                        coalesce_window_ms=5.0)
    _fill(db, corpus)
    n = 4
    outcomes = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        try:
            db.find_most_similar(corpus[0], k=3,
                                 metadata_filter={"g": {"$bogus": 1}})
            outcomes[i] = "no-raise"
        except ValueError:
            outcomes[i] = "raised"

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcomes == ["raised"] * n


def test_window_zero_is_the_direct_path(tmp_path, corpus):
    db = VectorDatabase(storage_file=str(tmp_path / "e.pkl"))
    _fill(db, corpus)
    assert db._engine._coalescer is None
    ids, _, _ = db.find_most_similar(corpus[3], k=1)
    assert ids[0] == 3


def test_malformed_query_fails_only_its_caller(tmp_path, corpus):
    db = VectorDatabase(storage_file=str(tmp_path / "f.pkl"),
                        coalesce_window_ms=20.0)
    _fill(db, corpus)
    n = 4
    outcomes = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        try:
            q = corpus[i] if i != 2 else corpus[i][:7]  # wrong dim for #2
            r = db.find_most_similar(q, k=3)
            outcomes[i] = ("ok", list(r[0]))
        except Exception as e:  # noqa: BLE001
            outcomes[i] = ("err", type(e).__name__)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcomes[2][0] == "err"  # the bad query fails...
    for i in (0, 1, 3):
        assert outcomes[i][0] == "ok" and outcomes[i][1][0] == i, outcomes[i]


def test_interrupted_leader_never_strands_followers(tmp_path, corpus,
                                                    monkeypatch):
    db = VectorDatabase(storage_file=str(tmp_path / "g.pkl"),
                        coalesce_window_ms=30.0)
    _fill(db, corpus)
    coal = db._engine._coalescer

    def boom(batch):
        raise KeyboardInterrupt  # a BaseException the group loop won't catch

    monkeypatch.setattr(type(coal), "_dispatch_groups",
                        staticmethod(lambda batch: boom(batch)))
    n = 4
    outcomes = [None] * n
    barrier = threading.Barrier(n)

    def worker(i):
        barrier.wait()
        try:
            db.find_most_similar(corpus[i], k=3)
            outcomes[i] = "ok"
        except KeyboardInterrupt:
            outcomes[i] = "interrupted"  # the leader itself
        except RuntimeError:
            outcomes[i] = "aborted"  # followers get the retryable error

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in threads), "a follower is stranded"
    assert outcomes.count("interrupted") == 1
    assert outcomes.count("aborted") == n - 1


def test_runtime_window_toggle_under_traffic(tmp_path, corpus):
    db = VectorDatabase(storage_file=str(tmp_path / "h.pkl"),
                        coalesce_window_ms=2.0)
    _fill(db, corpus)
    stop = threading.Event()
    errors = []

    def searcher():
        r = np.random.default_rng(0)
        while not stop.is_set():
            try:
                db.find_most_similar(r.standard_normal(16).astype(np.float32),
                                     k=3)
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    import time as _t

    for _ in range(20):  # flip the knob while queries are in flight
        db.set_coalesce_window(0)
        _t.sleep(0.005)
        db.set_coalesce_window(1.0)
        _t.sleep(0.005)
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors[:3]


def test_group_dispatch_true_sizes_and_device_pow2(tmp_path, corpus):
    """The coalescer passes each group's TRUE size to the scan (a host-routed
    group must not pay padded BLAS rows — measured 2x slower on a 1-core
    host); the DEVICE boundary pads to one pow2 shape (>= 8) so variable
    group sizes share a single compiled program."""
    db = VectorDatabase(storage_file=str(tmp_path / "p.pkl"),
                        coalesce_window_ms=30.0)
    _fill(db, corpus)
    seen = []
    eng = db._engine
    orig = eng._scan

    def spy(qs, *a, **kw):
        seen.append(np.shape(qs)[0])
        return orig(qs, *a, **kw)

    eng._scan = spy
    try:
        for n_threads in (1, 3, 4):
            seen.clear()
            results = {}

            def hit(i):
                results[i] = db.find_most_similar(corpus[i], k=3)

            ts = [threading.Thread(target=hit, args=(i,))
                  for i in range(n_threads)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert seen, "no dispatch recorded"
            assert all(s <= n_threads for s in seen), seen  # true sizes
            for i in results:
                assert results[i][0][0] == i  # self-match first
    finally:
        eng._scan = orig


def test_device_boundary_pads_batch_to_pow2():
    """StoreSnapshot._device_search pads any 2-D batch to pow2 >= 8 (one
    compiled program across the coalescer's variable group sizes) and
    slices the pad rows off the results."""
    from minivectordb_tpu.core.store import VectorStore
    from minivectordb_tpu.ops import scan as scan_ops

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((500, 32)).astype(np.float32)
    st = VectorStore(32)
    st.append(mat)
    snap = st.snapshot()
    shapes = []
    orig = scan_ops.scan_topk

    def spy(buf, inv, q, *a, **kw):
        shapes.append(int(q.shape[0]))
        return orig(buf, inv, q, *a, **kw)

    scan_ops.scan_topk = spy
    try:
        for g in (1, 3, 4, 9):
            vals, idx = snap._device_search(mat[:g], 5)
            assert vals.shape == (g, 5) and idx.shape == (g, 5)
            for r in range(g):
                assert idx[r, 0] == r  # self-match survives the pad slice
        assert shapes == [8, 8, 8, 16], shapes
    finally:
        scan_ops.scan_topk = orig


def test_deferred_fetch_host_routes_when_host_wins():
    """fetch=False callers (coalesced groups, async batches) must not be
    forced onto a losing device dispatch: when the router's EMAs say the
    host path wins, the deferred search serves materialized host results."""
    from minivectordb_tpu.core.store import (
        _HOST_ALWAYS_BYTES,
        VectorStore,
    )

    rng = np.random.default_rng(3)
    d = 64
    n = _HOST_ALWAYS_BYTES // (d * 4) + 512  # above the always-host bound
    mat = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore(d)
    store.append(mat)
    snap = store.snapshot()
    assert snap._host_eligible("exact", 2)

    snap.router.host_ema = 0.001
    snap.router.dev_ema = 1.0
    q = rng.standard_normal((2, d)).astype(np.float32)
    vals, idx = snap.search(q, 4, fetch=False)
    assert isinstance(vals, np.ndarray) and isinstance(idx, np.ndarray)

    # oracle check on the host answer
    qn = q[0] / np.linalg.norm(q[0])
    oracle = (mat @ qn) / np.linalg.norm(mat, axis=1)
    assert idx[0][0] == int(np.argmax(oracle))

    # device preferred -> deferred dispatch returns device arrays
    snap.router.host_ema = 1.0
    snap.router.dev_ema = 0.001
    vals2, _ = snap.search(q, 4, fetch=False)
    assert not isinstance(vals2, np.ndarray)


def test_writers_not_blocked_by_leader_dispatch(tmp_path, corpus):
    """A coalescer leader's dispatch must not hold the ENGINE lock: writers
    (store_embedding) proceed while a slow group dispatch is in flight.
    Round-3 held the engine lock across _dispatch_groups, so every store
    waited out the leader — measured 0.74x uncoalesced throughput on the
    device-routed config4 mix."""
    import time

    db = VectorDatabase(storage_file=str(tmp_path / "w.pkl"),
                        coalesce_window_ms=5.0)
    _fill(db, corpus)
    eng = db._engine

    real_scan = eng._scan
    in_dispatch = threading.Event()

    def slow_scan(*a, **kw):
        in_dispatch.set()
        time.sleep(0.5)
        return real_scan(*a, **kw)

    eng._scan = slow_scan
    res = {}

    def searcher():
        res["hits"] = db.find_most_similar(corpus[0], k=3)

    t = threading.Thread(target=searcher)
    t.start()
    assert in_dispatch.wait(5.0)
    t0 = time.perf_counter()
    db.store_embedding("w1", np.ones(16, dtype=np.float32), {"g": 9})
    store_s = time.perf_counter() - t0
    t.join()
    eng._scan = real_scan
    assert store_s < 0.25, (
        f"store blocked {store_s:.3f}s behind a coalesced dispatch"
    )
    assert res["hits"][0][0] == 0
