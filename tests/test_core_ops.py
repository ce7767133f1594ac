"""Unit tests for the device scan/store internals against numpy oracles."""

import numpy as np
import pytest

from minivectordb_tpu.core.store import VectorStore
from minivectordb_tpu.ops import scan as scan_ops


def _cosine_oracle(mat, q):
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = np.inf
    return (mat @ qn) / norms


def test_scan_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((777, 48)).astype(np.float32)
    q = rng.standard_normal(48).astype(np.float32)
    store = VectorStore(48)
    store.append(mat)
    vals, idx = store.search(q[None], k=10)
    oracle = _cosine_oracle(mat, q)
    expected = np.argsort(-oracle)[:10]
    np.testing.assert_array_equal(idx[0], expected)
    np.testing.assert_allclose(vals[0], oracle[expected], rtol=1e-5, atol=1e-5)


def test_masked_scan_excludes_rows():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal(16).astype(np.float32)
    store = VectorStore(16)
    store.append(mat)
    mask = np.zeros(300, dtype=bool)
    allowed = [5, 50, 100, 299]
    mask[allowed] = True
    vals, idx = store.search(q[None], k=4, mask=mask)
    assert set(idx[0].tolist()) == set(allowed)
    oracle = _cosine_oracle(mat, q)
    order = sorted(allowed, key=lambda r: -oracle[r])
    np.testing.assert_array_equal(idx[0], order)


def test_incremental_append_and_delete_consistency():
    rng = np.random.default_rng(2)
    store = VectorStore(8)
    ref = np.zeros((0, 8), dtype=np.float32)
    for step in range(5):
        batch = rng.standard_normal((rng.integers(1, 40), 8)).astype(np.float32)
        store.append(batch)
        ref = np.vstack([ref, batch])
        # interleave a delete
        if step % 2 == 1 and ref.shape[0] > 3:
            doomed = [0, ref.shape[0] // 2]
            store.delete_rows(doomed)
            ref = np.delete(ref, doomed, axis=0)
        q = rng.standard_normal(8).astype(np.float32)
        vals, idx = store.search(q[None], k=min(5, ref.shape[0]))
        oracle = _cosine_oracle(ref, q)
        expected = np.argsort(-oracle)[: min(5, ref.shape[0])]
        np.testing.assert_array_equal(idx[0], expected)
        np.testing.assert_array_equal(store.view(), ref)


def test_capacity_growth_across_bucket_boundary():
    rng = np.random.default_rng(3)
    store = VectorStore(4)
    mat = rng.standard_normal((1500, 4)).astype(np.float32)  # crosses 1024
    store.append(mat[:1000])
    store.append(mat[1000:])
    assert store.count == 1500
    assert store.capacity == 2048
    q = rng.standard_normal(4).astype(np.float32)
    vals, idx = store.search(q[None], k=3)
    oracle = _cosine_oracle(mat, q)
    np.testing.assert_array_equal(idx[0], np.argsort(-oracle)[:3])


def test_int8_store_approximates_cosine():
    rng = np.random.default_rng(4)
    mat = rng.standard_normal((500, 64)).astype(np.float32)
    q = rng.standard_normal(64).astype(np.float32)
    store = VectorStore(64, device_dtype="int8")
    store.append(mat)
    vals, idx = store.search(q[None], k=5)
    oracle = _cosine_oracle(mat, q)
    # int8 quantization: top-1 should agree, scores close
    assert idx[0][0] == np.argmax(oracle)
    np.testing.assert_allclose(vals[0], oracle[idx[0]], atol=0.03)


def test_topk_modes():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    scores = rng.standard_normal((2, 1 << 15)).astype(np.float32)
    vals, idx = scan_ops.topk_last_axis(jnp.asarray(scores), 7, "exact")
    for b in range(2):
        expected = np.argsort(-scores[b])[:7]
        np.testing.assert_array_equal(np.asarray(idx)[b], expected)
        np.testing.assert_allclose(np.asarray(vals)[b], scores[b][expected])
    # approx mode: right shapes, high overlap with exact
    avals, aidx = scan_ops.topk_last_axis(jnp.asarray(scores), 7, "approx")
    assert np.asarray(avals).shape == (2, 7)
    for b in range(2):
        expected = set(np.argsort(-scores[b])[:7].tolist())
        got = set(np.asarray(aidx)[b].tolist())
        assert len(expected & got) >= 5


def test_k_bucketing():
    assert scan_ops.k_bucket(1, 1024) == 1
    assert scan_ops.k_bucket(3, 1024) == 4
    assert scan_ops.k_bucket(1000, 1024) == 1024
    assert scan_ops.k_bucket(5000, 1024) == 1024


def test_snapshot_survives_concurrent_inplace_update():
    """A snapshot taken before a mutation must stay searchable after the
    mutation syncs (regression: in-place updates donated the device buffer a
    live snapshot still referenced, so the out-of-lock scan raised
    'Buffer has been deleted or donated')."""
    rng = np.random.default_rng(7)
    for dtype in ("float32", "int8", "mixed"):
        store = VectorStore(16, device_dtype=dtype)
        base = rng.normal(size=(64, 16)).astype(np.float32)
        store.append(base)
        snap = store.snapshot()  # holds the pre-mutation buffer
        # incremental (non-bucket-crossing) mutation -> in-place update path
        store.append(rng.normal(size=(4, 16)).astype(np.float32))
        store.sync()
        # old snapshot still valid: scans the pre-mutation view
        q = base[3][None, :]
        vals, idx = snap.search(q, 1)
        assert idx[0, 0] == 3
        assert snap.count == 64
        # new snapshot sees the appended rows
        vals2, idx2 = store.snapshot().search(q, 1)
        assert idx2[0, 0] == 3


def test_snapshot_release_restores_donation():
    """Once no snapshot is alive, sync() goes back to donating updates."""
    rng = np.random.default_rng(11)
    store = VectorStore(8)
    store.append(rng.normal(size=(32, 8)).astype(np.float32))
    snap = store.snapshot()
    assert not store._may_donate()
    del snap
    assert store._may_donate()


def test_pin_suppresses_donation_while_holder_alive():
    """store.pin(holder): quantized IVF indexes retain the store buffer as
    their exact-rescore corpus; sync() must not donate it while the holder
    lives (donation errors are invisible on the CPU backend, so the pin
    contract is asserted directly)."""
    rng = np.random.default_rng(12)
    store = VectorStore(8)
    store.append(rng.normal(size=(32, 8)).astype(np.float32))
    store.sync()

    class Holder:
        pass

    h = Holder()
    store.pin(h)
    assert not store._may_donate()
    del h
    assert store._may_donate()


def test_ivf_database_rescore_corpus_tracks_deletes():
    """Public-API: after deletes on a quantized-IVF database, the remapped
    slot ids must resolve against the COMPACTED corpus (rescore refs are
    refreshed atomically with the id remap in _on_rows_deleted)."""
    import os
    import uuid

    from minivectordb_tpu.vector_database import VectorDatabase

    path = f"/tmp/rescore_del_{uuid.uuid4().hex}.pkl"
    db = VectorDatabase(
        storage_file=path, index="ivf",
        ivf_opts={"build_threshold": 1, "nlist": 4, "iters": 3,
                  "rebuild_floor": 10_000},
    )
    rng = np.random.default_rng(13)
    mat = rng.normal(size=(256, 16)).astype(np.float32)
    db.store_embeddings_batch(list(range(256)), mat)
    ids, _, _ = db.find_most_similar(mat[200], k=1)
    assert ids[0] == 200
    assert getattr(db._engine._ivf, "_data", None) is not None
    # delete a prefix chunk: every surviving row shifts down by 50
    for uid in range(50):
        db.delete_embedding(uid)
    assert db._engine._ivf is not None, "delete must not discard the index"
    for probe in (60, 150, 255):
        ids, _, _ = db.find_most_similar(mat[probe], k=1)
        assert ids[0] == probe, (probe, ids)
    if os.path.exists(path):
        os.remove(path)


def test_dist_snapshot_survives_concurrent_update():
    import jax
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import search_mesh

    mesh = search_mesh(len(jax.devices()))
    rng = np.random.default_rng(5)
    idx = DistributedScanIndex(mesh, 16)
    base = rng.normal(size=(128, 16)).astype(np.float32)
    idx.load(base)
    snap = idx.snapshot()
    idx.update(rng.normal(size=(8, 16)).astype(np.float32), 128, 136)
    vals, ids = snap.search(base[5][None, :], 1)
    assert ids[0, 0] == 5


def test_warmup_moves_build_and_sync_off_first_query(tmp_path):
    """warmup() syncs the device cache, builds a due IVF index, and leaves
    the first real query cheap; idempotent and correctness-neutral."""
    import numpy as np

    from minivectordb_tpu.vector_database import VectorDatabase

    db = VectorDatabase(
        storage_file=str(tmp_path / "w.pkl"), index="ivf",
        ivf_opts={"build_threshold": 64, "nlist": 8, "nprobe": 8},
    )
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((200, 16)).astype(np.float32)
    db.store_embeddings_batch(list(range(200)), list(mat))
    assert db._engine._ivf is None
    db.warmup()
    assert db._engine._ivf is not None  # built during warmup, not the query
    db.warmup()  # idempotent
    ids, _, _ = db.find_most_similar(mat[5], k=3, nprobe=1_000_000)
    assert ids[0] == 5

    empty = VectorDatabase(storage_file=str(tmp_path / "e.pkl"))
    empty.warmup()  # no corpus: a clean no-op
