"""Round-5 VERDICT items 7 + 8: the adaptive host/device router must
converge to the winning path on both host-favored and device-favored
workloads, and coalesce_window_ms="auto" must size/enable the dynamic
batching window itself (self-disabling when calls never overlap).
Plus ADVICE r4: one scalar type for returned scores on every format path.
"""

import threading

import numpy as np
import pytest

from minivectordb_tpu.core.store import _ScanRouter, _ROUTER_REFRESH_EVERY
from minivectordb_tpu.core.engine import _Coalescer
from minivectordb_tpu.vector_database import VectorDatabase


# -- router convergence (unit level: feed measured timings, read decisions) --


def _converge(router, host_dt, dev_dt, steps=40):
    """Drive the router with fixed per-path costs; returns the decision mix
    over the tail once both EMAs exist."""
    tail = []
    for _ in range(steps):
        which = router.choose()
        if which == "probe":
            # background probe completes immediately in this harness
            router.record("device", dev_dt)
            router.warming = False
            which = "host"
        router.record(which, host_dt if which == "host" else dev_dt)
        tail.append(which)
    return tail


def test_router_converges_host_favored():
    r = _ScanRouter()
    tail = _converge(r, host_dt=0.001, dev_dt=0.010)
    # after warmup, the steady-state pick is host (periodic re-probes aside)
    steady = tail[-16:]
    assert steady.count("host") >= 14
    assert r.host_ema < r.dev_ema


def test_router_converges_device_favored():
    r = _ScanRouter()
    tail = _converge(r, host_dt=0.010, dev_dt=0.001)
    steady = tail[-16:]
    assert steady.count("device") >= 14
    assert r.dev_ema < r.host_ema


def test_router_tracks_a_flip():
    """Costs invert mid-run (corpus grew / link improved): the periodic
    re-probe must flip the steady-state decision."""
    r = _ScanRouter()
    _converge(r, host_dt=0.001, dev_dt=0.010, steps=20)
    assert r.choose() in ("host", "probe")
    r.record("host", 0.001)
    # now the device becomes 10x faster; re-probes blend the new cost in
    tail = _converge(r, host_dt=0.010, dev_dt=0.0001,
                     steps=4 * _ROUTER_REFRESH_EVERY)
    assert tail[-8:].count("device") >= 7


def test_router_failed_probe_recovers():
    r = _ScanRouter()
    for _ in range(8):
        which = r.choose()
        if which == "probe":
            r.dev_ema = float("inf")  # probe failed (flaky link)
            r.warming = False
        else:
            r.record("host", 0.001)
    assert r.choose() == "host"  # never routes onto the failing path
    r.record("device", 0.0001)  # link recovered via a later probe
    assert r.dev_ema == 0.0001  # inf replaced outright, not blended


# -- auto coalescing ----------------------------------------------------------


def _build_db(tmp_path, n=20_000, d=32, window="auto"):
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    db = VectorDatabase(
        storage_file=str(tmp_path / "db.pkl"), coalesce_window_ms=window
    )
    db.store_embeddings_batch(list(range(n)), list(mat))
    return db, mat


def test_auto_coalesce_correct_and_groups(tmp_path):
    db, mat = _build_db(tmp_path)
    expected = {}
    for i in range(16):
        db.set_coalesce_window(0)
        expected[i] = db.find_most_similar(mat[i], k=5)
        db.set_coalesce_window("auto")
    coal = db._engine._coalescer
    assert coal is not None and coal.auto

    errs = []

    def worker(tid):
        try:
            for j in range(40):
                i = (tid * 40 + j) % 16
                got = db.find_most_similar(mat[i], k=5)
                assert got[0] == expected[i][0], (got[0], expected[i][0])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    coal = db._engine._coalescer
    # 320 concurrent calls: grouping must have occurred (fewer dispatches
    # than calls) and the controller must have observed concurrency
    assert coal.calls > 0 and coal.dispatches < coal.calls
    st = db.stats()["coalescing"]
    assert st["auto"] is True and st["dispatches"] == coal.dispatches


def test_auto_coalesce_self_disables_when_serial(tmp_path):
    db, mat = _build_db(tmp_path, n=2000)
    coal = db._engine._coalescer
    for i in range(30):
        db.find_most_similar(mat[i], k=3)
    # strictly serial callers: group size stays 1, the window must be closed
    assert coal.group_ema < coal._AUTO_GROUP_ON
    assert coal.window_s == 0.0


def test_auto_coalesce_rejects_bad_string(tmp_path):
    with pytest.raises(ValueError):
        VectorDatabase(
            storage_file=str(tmp_path / "x.pkl"), coalesce_window_ms="fast"
        )
    db, _ = _build_db(tmp_path, n=100)
    with pytest.raises(ValueError):
        db.set_coalesce_window("sometimes")


# -- ADVICE r4: stable score scalar type --------------------------------------


def test_score_scalar_type_is_python_float(tmp_path):
    db, mat = _build_db(tmp_path, n=64, window=0)
    # full batch (fast path), filtered batch with masked slots (row path),
    # and single query must all return plain Python floats
    _, scores, _ = db.find_most_similar(mat[0], k=5)
    assert all(type(s) is float for s in scores)
    for triple in db.find_most_similar_batch(mat[:4], k=5):
        assert all(type(s) is float for s in triple[1])
    for triple in db.find_most_similar_batch(
        mat[:4], metadata_filter={"__none__": 1}, k=5
    ):
        assert triple == ([], [], [])
    db.store_embedding("tagged", mat[0], {"grp": 1})
    for triple in db.find_most_similar_batch(
        mat[:4], metadata_filter={"grp": 1}, k=5
    ):
        assert all(type(s) is float for s in triple[1])


# -- autocut zero-denominator guard (found by the round-5 verify drive) -------


def test_autocut_distances_exact_match_zero():
    from minivectordb_tpu.core.engine import autocut_distances, autocut_scores

    # exact match first: distance 0.0, everything after is an infinite
    # relative increase -> cut all but the exact match
    assert autocut_distances([0.0, 0.4, 0.5]) == [1, 2]
    assert autocut_distances([0.0, 0.0, 0.0]) == []
    assert autocut_scores([0.0, -0.2, -0.3]) == [1, 2]
    assert autocut_scores([0.5, 0.49, 0.48]) == []


def test_usearch_autocut_on_exact_match(tmp_path):
    from minivectordb_tpu.sharded_vector_database_usearch import (
        ShardedVectorDatabaseUsearch,
    )

    rng = np.random.default_rng(4)
    vecs = [rng.standard_normal(64).astype(np.float32) for _ in range(5)]
    u = ShardedVectorDatabaseUsearch(storage_dir=str(tmp_path / "u"),
                                     shard_size=3)
    u.store_embeddings_batch(list(range(5)), vecs)
    # querying a stored vector: top distance ~0; must not crash and the
    # ordering stays ascending
    ids, dist, _ = u.find_most_similar(vecs[1], k=3, autocut=True)
    assert ids[0] == 1 and list(dist) == sorted(dist)
