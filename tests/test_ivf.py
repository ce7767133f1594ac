"""IVF coarse-quantized search: recall vs brute-force oracle, exactness at
nprobe=nlist."""

import numpy as np
import pytest

from minivectordb_tpu.ops.ivf import IVFIndex


def _oracle_topk(mat, q, k):
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / np.linalg.norm(mat, axis=1)
    return set(np.argsort(-scores)[:k].tolist())


def test_ivf_exact_when_probing_all_lists():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((2000, 32)).astype(np.float32)
    index = IVFIndex(nlist=16, nprobe=16, iters=5)
    index.build(mat)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    vals, ids = index.search(q, k=10)
    for b in range(4):
        assert set(ids[b].tolist()) == _oracle_topk(mat, q[b], 10)


def test_ivf_recall_at_partial_probe():
    rng = np.random.default_rng(1)
    # clustered data: IVF should reach high recall with few probes
    centers = rng.standard_normal((32, 24)) * 4
    mat = np.vstack(
        [c + rng.standard_normal((200, 24)) * 0.5 for c in centers]
    ).astype(np.float32)
    index = IVFIndex(nlist=32, nprobe=6, iters=10)
    index.build(mat)
    queries = mat[rng.choice(len(mat), 20, replace=False)] + 0.01
    hits = total = 0
    for q in queries:
        oracle = _oracle_topk(mat, q, 10)
        _, ids = index.search(q[None], k=10)
        hits += len(oracle & set(ids[0].tolist()))
        total += 10
    recall = hits / total
    assert recall >= 0.9, f"recall@10 too low: {recall}"


def test_ivf_k_larger_than_probed_rows_is_bounded():
    rng = np.random.default_rng(2)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    index = IVFIndex(nlist=8, nprobe=8, iters=3)
    index.build(mat)
    vals, ids = index.search(rng.standard_normal((1, 16)).astype(np.float32), k=50)
    assert ids.shape == (1, 50)
    # all returned ids valid and unique
    assert len(set(ids[0].tolist())) == 50
    assert (vals[0] > -1e38).all()


def test_ivf_skewed_clusters_bounded_padding():
    """Heavily skewed data must not explode the padded layout: oversized
    clusters split into duplicate centroids, and recall stays high."""
    rng = np.random.default_rng(5)
    # 90% of points in one tight blob, rest spread out
    blob = rng.standard_normal((1800, 16)) * 0.1 + 5.0
    rest = rng.standard_normal((200, 16)) * 3.0
    mat = np.vstack([blob, rest]).astype(np.float32)
    index = IVFIndex(nlist=16, nprobe=8, iters=5)
    index.build(mat)
    # padding stays near the cap, far below the 1800-row blob
    assert index.pad_len < 1000
    # queries in the blob recall their neighbors (duplicate centroids rank
    # adjacent, so probes cover the split lists)
    q = mat[[10, 50, 1900]]
    vals, ids = index.search(q, k=10)
    hits = 0
    for b in range(3):
        oracle = _oracle_topk(mat, q[b], 10)
        hits += len(oracle & set(ids[b].tolist()))
    assert hits / 30 >= 0.8, hits / 30


def test_ivf_int8_lists_recall_and_scores():
    """int8 packed lists (device_dtype='int8'): symmetric 127-scale
    quantization with per-slot inverse-norm reconstruction. Scores must
    track f32 cosine within quantization error and recall must stay high."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 3
    mat = (centers[rng.integers(0, 8, 600)]
           + rng.standard_normal((600, 32)).astype(np.float32))
    index = IVFIndex(nlist=8, nprobe=8, iters=5, device_dtype="int8")
    index.build(mat)
    assert index._list_inv is not None
    q = mat[[3, 77, 500]] + 0.05 * rng.standard_normal((3, 32)).astype(
        np.float32
    )
    vals, ids = index.search(q, k=10)  # nprobe = nlist: exhaustive probe
    hits = 0
    for b in range(3):
        oracle = _oracle_topk(mat, q[b], 10)
        hits += len(oracle & set(ids[b].tolist()))
        # reconstructed scores are real cosines (within int8 rounding)
        qn = q[b] / np.linalg.norm(q[b])
        for s, rid in zip(vals[b], ids[b]):
            ref = float(mat[rid] @ qn / np.linalg.norm(mat[rid]))
            assert abs(float(s) - ref) < 0.02, (s, ref)
    assert hits / 30 >= 0.9, hits / 30


def test_ivf_int8_grouped_kernel_matches_xla_path():
    """The interpreted grouped Pallas kernel (the TPU int8 route) and the
    XLA fallback must agree bit-for-bit on the same int8 tables."""
    import jax.numpy as jnp

    from minivectordb_tpu.ops.ivf import _ivf_search
    from minivectordb_tpu.ops.pallas_ivf import pallas_ivf_search_grouped

    rng = np.random.default_rng(8)
    mat = rng.standard_normal((400, 16)).astype(np.float32)
    index = IVFIndex(nlist=4, nprobe=3, iters=4, device_dtype="int8")
    index.build(mat)
    lists, list_ids, list_valid = index._tables
    q = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
    gv, gi = pallas_ivf_search_grouped(
        index.centroids, lists, list_ids, list_valid, q, 3, 8,
        list_inv=index._list_inv,
    )
    xv, xi = _ivf_search(
        index.centroids, lists, list_ids, list_valid, q, 3, 8,
        list_inv=index._list_inv,
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(xv), rtol=1e-6)


def test_ivf_int8_state_roundtrip():
    """Persisted int8 layout reattaches with the inverse-norm table."""
    rng = np.random.default_rng(9)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    index = IVFIndex(nlist=4, nprobe=4, iters=4, device_dtype="int8")
    index.build(mat)
    state = index.state_dict()
    index2 = IVFIndex.from_state(state, mat)
    assert index2._list_inv is not None
    q = mat[[5, 100]]
    v1, i1 = index.search(q, k=5)
    v2, i2 = index2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_ivf_quantized_rescore_returns_exact_scores():
    """Quantized (int8/bf16) snapshots run the two-stage search: quantized
    top-K' candidates, then exact f32 rescore against the corpus refs the
    index retains (ops/ivf.py:_exact_rescore). Returned scores must equal
    the f32 cosine to float precision — not merely within quantization
    error — and ranking must match the oracle ranking of the probed set."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 48)).astype(np.float32) * 3
    mat = (centers[rng.integers(0, 6, 500)]
           + rng.standard_normal((500, 48)).astype(np.float32))
    for dtype in ("int8", "bfloat16"):
        index = IVFIndex(nlist=6, nprobe=6, iters=5, device_dtype=dtype)
        index.build(mat)
        assert index._data is not None  # corpus refs retained for rescore
        q = mat[[10, 200]] + 0.05 * rng.standard_normal((2, 48)).astype(
            np.float32
        )
        vals, ids = index.search(q, k=10)  # exhaustive probe
        for b in range(2):
            qn = q[b] / np.linalg.norm(q[b])
            oracle = _oracle_topk(mat, q[b], 10)
            assert set(ids[b].tolist()) == oracle, dtype
            for s, rid in zip(vals[b], ids[b]):
                ref = float(mat[rid] @ qn / np.linalg.norm(mat[rid]))
                assert abs(float(s) - ref) < 1e-5, (dtype, s, ref)


def test_ivf_f32_lists_skip_rescore():
    """float32 lists are already exact — no corpus refs, no second stage."""
    rng = np.random.default_rng(12)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    index = IVFIndex(nlist=4, nprobe=4, iters=3)
    index.build(mat)
    assert index._data is None
    snap = index.snapshot()
    assert snap.data is None


def test_precompiled_build_matches_plain_build():
    """precompile_async pre-builds the SAME traced programs build() would
    jit, so the resulting index must be bitwise identical to a plain build
    (centroids, packed layout, and search results)."""
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((3000, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)

    plain = IVFIndex(nlist=16, nprobe=16, iters=5, seed=3)
    plain.build(mat)

    pre = IVFIndex(nlist=16, nprobe=16, iters=5, seed=3)
    pre.precompile_async(mat.shape[0], mat.shape[1], mat.shape[0])
    pre.build(mat)
    # both executables were consumed (no leak into later builds)
    assert pre._precompiled == {}
    assert pre._precompile_thread is None

    np.testing.assert_array_equal(
        np.asarray(plain.centroids), np.asarray(pre.centroids)
    )
    np.testing.assert_array_equal(
        np.asarray(plain._list_ids), np.asarray(pre._list_ids)
    )
    v1, i1 = plain.search(q, k=10)
    v2, i2 = pre.search(q, k=10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_precompile_shape_mismatch_falls_back_to_jit():
    """A precompile raced by corpus growth misses on shape and build still
    succeeds through the normal jit path."""
    rng = np.random.default_rng(8)
    mat = rng.standard_normal((2000, 16)).astype(np.float32)
    index = IVFIndex(nlist=8, nprobe=8, iters=4)
    index.precompile_async(1500, 16, 1500)  # stale n: shapes won't match
    index.build(mat)
    vals, ids = index.search(mat[:3], k=5)
    for b in range(3):
        assert ids[b, 0] == b  # self-match first at full probe


def test_nprobe_equal_configured_nlist_is_exact_despite_splits():
    """Skew splitting grows the centroid count past the configured nlist
    (oversized clusters become duplicate centroids). The module contract is
    'with nprobe = nlist the search is exact': search must widen the probe
    by the duplicate count so nprobe keeps counting DISTINCT trained
    clusters — otherwise a heavily skewed corpus silently turns the
    documented exhaustive setting into a lossy probe."""
    from minivectordb_tpu.ops.ivf import IVFIndex

    rng = np.random.default_rng(0)
    # unclustered Gaussian rows force unbalanced k-means lists -> splits
    mat = rng.normal(size=(600, 32)).astype(np.float32)
    idx = IVFIndex(nlist=16, nprobe=16, iters=25, device_dtype="float32")
    idx.build(mat)
    assert idx.n_dup > 0, "corpus did not trigger splitting; adjust seed"
    assert int(idx.centroids.shape[0]) > 16
    sn = (mat / np.linalg.norm(mat, axis=1, keepdims=True))
    q = rng.normal(size=(4, 32)).astype(np.float32)
    vals, ids = idx.search(q, 10, nprobe=16)  # nprobe == configured nlist
    for b in range(4):
        s = sn @ (q[b] / np.linalg.norm(q[b]))
        assert set(ids[b].tolist()) == set(np.argsort(-s)[:10].tolist())
    # persisted layouts carry the widening
    st = idx.state_dict()
    assert st["n_dup"] == idx.n_dup
    re = IVFIndex.from_state(st, mat)
    vals, ids = re.search(q, 10, nprobe=16)
    for b in range(4):
        s = sn @ (q[b] / np.linalg.norm(q[b]))
        assert set(ids[b].tolist()) == set(np.argsort(-s)[:10].tolist())


def test_mesh_nprobe_equal_configured_nlist_is_exact_despite_splits():
    """Same contract across the mesh wrapper: per-chip probe width derives
    from the widened nprobe, so nprobe = configured nlist probes every
    list on every chip."""
    import jax

    from minivectordb_tpu.ops.ivf import IVFIndex
    from minivectordb_tpu.parallel.dist_ivf import DistributedIVFIndex

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    from jax.sharding import Mesh
    from minivectordb_tpu.parallel.dist_scan import SHARD_AXIS

    mesh = Mesh(np.array(jax.devices()).reshape(-1), (SHARD_AXIS,))
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(600, 32)).astype(np.float32)
    base = IVFIndex(nlist=16, nprobe=16, iters=25, device_dtype="float32")
    base.build(mat)
    assert base.n_dup > 0, "corpus did not trigger splitting; adjust seed"
    dist = DistributedIVFIndex(mesh, base)
    sn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    vals, ids = dist.search(q, 10, nprobe=16)
    for b in range(4):
        s = sn @ (q[b] / np.linalg.norm(q[b]))
        assert set(ids[b].tolist()) == set(np.argsort(-s)[:10].tolist())
