"""Zero-copy device-resident query batches through the public API.

A serving pipeline whose queries already live on the device (the JAX
encoder's output, or a batch uploaded once with jax.device_put) must not
bounce them through the host: ``find_most_similar_batch`` passes a
jax.Array straight to the device scan — no np conversion, no re-upload,
no host-BLAS routing — and returns results identical to the numpy path.

No reference equivalent (the reference is numpy-in/numpy-out only,
vector_database.py:466-536); this is the TPU-native serving contract the
config5 net-of-link benchmark decomposition measures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minivectordb_tpu.vector_database import VectorDatabase


def _mk_db(tmp_path, n=300, d=32, seed=0, **kw):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    db = VectorDatabase(storage_file=str(tmp_path / "dq.pkl"), **kw)
    db.store_embeddings_batch(
        list(range(n)), mat, [{"g": int(i % 4)} for i in range(n)]
    )
    return db, rng


def _assert_same(res_np, res_dev):
    assert len(res_np) == len(res_dev)
    for (ia, sa, ma), (ib, sb, mb) in zip(res_np, res_dev):
        assert list(ia) == list(ib)
        np.testing.assert_allclose(
            np.asarray(sa, np.float32), np.asarray(sb, np.float32),
            rtol=1e-5, atol=1e-6,
        )
        assert list(ma) == list(mb)


def test_flat_device_batch_matches_numpy(tmp_path):
    db, rng = _mk_db(tmp_path)
    q = rng.standard_normal((17, 32)).astype(np.float32)
    res_np = db.find_most_similar_batch(q, k=7)
    res_dev = db.find_most_similar_batch(jax.device_put(q), k=7)
    _assert_same(res_np, res_dev)


def test_flat_device_batch_filtered(tmp_path):
    db, rng = _mk_db(tmp_path)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    filt = {"g": {"$lte": 1}}
    res_np = db.find_most_similar_batch(q, k=6, metadata_filter=filt)
    res_dev = db.find_most_similar_batch(
        jax.device_put(q), k=6, metadata_filter=filt
    )
    _assert_same(res_np, res_dev)
    for ids, _, mds in res_dev:
        assert len(ids) == 6
        assert all(m["g"] <= 1 for m in mds)


def test_device_batch_1d_and_dtype_coercion(tmp_path):
    db, rng = _mk_db(tmp_path)
    q = rng.standard_normal(32).astype(np.float64)
    res_np = db.find_most_similar_batch(q.astype(np.float32), k=3)
    # 1-D f64 device array: reshaped + cast on device
    res_dev = db.find_most_similar_batch(jnp.asarray(q), k=3)
    _assert_same(res_np, res_dev)


def test_device_batch_k_exceeds_count(tmp_path):
    db, rng = _mk_db(tmp_path, n=4)
    q = rng.standard_normal((2, 32)).astype(np.float32)
    res_dev = db.find_most_similar_batch(jax.device_put(q), k=9)
    for ids, scores, _ in res_dev:
        assert len(ids) == 4  # min(k, count), reference contract
        assert list(scores) == sorted(scores, reverse=True)


def test_ivf_device_batch_matches_numpy(tmp_path):
    db, rng = _mk_db(
        tmp_path, n=2048, d=32,
        index="ivf", nlist=16, nprobe=16,
        ivf_opts={"build_threshold": 1, "iters": 2},
    )
    q = rng.standard_normal((32, 32)).astype(np.float32)
    db.find_most_similar(q[0], k=1)  # trigger the lazy build
    res_np = db.find_most_similar_batch(q, k=5)
    res_dev = db.find_most_similar_batch(jax.device_put(q), k=5)
    # nprobe = nlist is exact, so both paths return identical rows
    _assert_same(res_np, res_dev)


def test_device_batch_never_pulls_to_host(tmp_path, monkeypatch):
    """The zero-copy contract itself: the device batch is never converted
    to numpy anywhere on the unfiltered flat path (result drains — smaller
    shapes — are the only host materializations)."""
    db, rng = _mk_db(tmp_path, n=5000)
    q_dev = jax.device_put(rng.standard_normal((16, 32)).astype(np.float32))
    qshape = tuple(q_dev.shape)

    def guard(fn):
        def wrapped(a, *args, **kw):
            if isinstance(a, jax.Array) and tuple(a.shape) == qshape:
                raise AssertionError("device batch pulled to host")
            return fn(a, *args, **kw)

        return wrapped

    monkeypatch.setattr(np, "asarray", guard(np.asarray))
    monkeypatch.setattr(np, "ascontiguousarray", guard(np.ascontiguousarray))
    res = db.find_most_similar_batch(q_dev, k=5)
    assert len(res) == 16 and len(res[0][0]) == 5


def test_ivf_filtered_short_rerun_stays_on_device(tmp_path, monkeypatch):
    """The zero-copy contract on the HARD path: a filtered IVF probe whose
    probed lists lack k eligible rows for some queries reruns only those
    rows through the exact masked scan — and a device-resident batch must
    slice on device for that rerun, never materialize on host."""
    rng = np.random.default_rng(3)
    d, half = 32, 512
    blob_a = rng.standard_normal((half, d)).astype(np.float32) + 10.0
    blob_b = rng.standard_normal((half, d)).astype(np.float32) - 10.0
    mat = np.concatenate([blob_a, blob_b])
    db = VectorDatabase(
        storage_file=str(tmp_path / "dqs.pkl"),
        index="ivf", nlist=4, nprobe=1,
        ivf_opts={"build_threshold": 1, "iters": 3,
                  "filtered_min_frac": 0.0},
    )
    db.store_embeddings_batch(
        list(range(2 * half)), mat,
        [{"g": 0 if i < half else 1} for i in range(2 * half)],
    )
    db.find_most_similar(mat[0], k=1)  # trigger the lazy build

    # queries near blob B probe lists holding zero g==0 rows -> short ->
    # per-row exact rerun; queries near blob A satisfy the filter in-probe
    q = np.concatenate([
        rng.standard_normal((8, d)).astype(np.float32) + 10.0,
        rng.standard_normal((8, d)).astype(np.float32) - 10.0,
    ])
    filt = {"g": 0}
    res_np = db.find_most_similar_batch(q, k=5, metadata_filter=filt)

    q_dev = jax.device_put(q)
    qshape = tuple(q_dev.shape)

    def guard(fn):
        def wrapped(a, *args, **kw):
            if isinstance(a, jax.Array) and tuple(a.shape) == qshape:
                raise AssertionError(
                    "device batch pulled to host on the short-rerun path"
                )
            return fn(a, *args, **kw)

        return wrapped

    monkeypatch.setattr(np, "asarray", guard(np.asarray))
    monkeypatch.setattr(np, "ascontiguousarray", guard(np.ascontiguousarray))
    res_dev = db.find_most_similar_batch(q_dev, k=5, metadata_filter=filt)
    monkeypatch.undo()
    _assert_same(res_np, res_dev)
    for ids, _, mds in res_dev:
        assert len(ids) == 5
        assert all(m["g"] == 0 for m in mds)


def test_async_device_batch_matches_numpy(tmp_path):
    db, rng = _mk_db(tmp_path)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    res_np = db.find_most_similar_batch(q, k=4)
    pending = db.find_most_similar_batch_async(jax.device_put(q), k=4)
    _assert_same(res_np, pending.result())


def test_mesh_engine_converts_device_batch(tmp_path):
    """Mesh engines ship queries through shard_map as numpy — a device
    batch must still produce correct results (converted, not rejected)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from minivectordb_tpu.parallel.mesh import search_mesh

    db, rng = _mk_db(tmp_path, n=512, mesh=search_mesh(8))
    q = rng.standard_normal((4, 32)).astype(np.float32)
    res_np = db.find_most_similar_batch(q, k=5)
    res_dev = db.find_most_similar_batch(jax.device_put(q), k=5)
    _assert_same(res_np, res_dev)
