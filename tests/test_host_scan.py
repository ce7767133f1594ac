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
