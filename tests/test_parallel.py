"""Multi-chip sharded search on the 8-virtual-device CPU mesh: the
shard-local top-k + all-gather merge must agree exactly with the
single-device scan and the numpy oracle."""

import numpy as np
import pytest

import jax


def test_distributed_scan_matches_oracle():
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import search_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = search_mesh(8)
    rng = np.random.default_rng(0)
    n, d, k = 5000, 64, 10
    mat = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((3, d)).astype(np.float32)

    index = DistributedScanIndex(mesh, d)
    index.load(mat)
    vals, idx = index.search(queries, k)

    norms = np.linalg.norm(mat, axis=1)
    for b in range(queries.shape[0]):
        qn = queries[b] / np.linalg.norm(queries[b])
        oracle = (mat @ qn) / norms
        expected = np.argsort(-oracle)[:k]
        np.testing.assert_array_equal(np.sort(idx[b]), np.sort(expected))
        np.testing.assert_allclose(
            vals[b], np.sort(oracle[expected])[::-1], rtol=1e-5, atol=1e-5
        )


def test_distributed_scan_with_mask():
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import search_mesh

    mesh = search_mesh(8)
    rng = np.random.default_rng(1)
    n, d = 3000, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((1, d)).astype(np.float32)
    allowed = rng.choice(n, size=40, replace=False)
    mask = np.zeros(n, dtype=bool)
    mask[allowed] = True

    index = DistributedScanIndex(mesh, d)
    index.load(mat)
    vals, idx = index.search(q, 5, mask=mask)

    qn = q[0] / np.linalg.norm(q[0])
    oracle = (mat @ qn) / np.linalg.norm(mat, axis=1)
    order = sorted(allowed, key=lambda r: -oracle[r])[:5]
    np.testing.assert_array_equal(idx[0], order)


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_distributed_scan_pallas_impl_matches_xla(dtype):
    """The Pallas per-shard scan inside shard_map (interpret mode on the CPU
    mesh) must agree with the XLA per-shard path: exact for f32, identical
    quantized scores for int8."""
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import search_mesh

    mesh = search_mesh(8)
    rng = np.random.default_rng(7)
    n, d, k = 3000, 32, 8  # capacity 4096 -> 512 local rows per device
    mat = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    mask = rng.random(n) < 0.5

    ref = DistributedScanIndex(mesh, d, device_dtype=dtype, search_impl="xla")
    ref.load(mat)
    pal = DistributedScanIndex(mesh, d, device_dtype=dtype,
                               search_impl="pallas")
    pal.load(mat)

    for m in (None, mask):
        rv, ri = ref.search(queries, k, mask=m)
        pv, pi = pal.search(queries, k, mask=m)
        np.testing.assert_array_equal(ri, pi)
        np.testing.assert_allclose(rv, pv, rtol=1e-5, atol=1e-5)


def test_pod_mesh_hierarchical_scan_matches_oracle():
    """2-D (dcn, ici) pod mesh: per-chip top-k merges over ICI first, then
    one k-wide list per host crosses DCN — result must equal the numpy
    oracle exactly (2 hosts x 4 chips emulated on the CPU mesh)."""
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import pod_mesh

    mesh = pod_mesh(2, 4)
    rng = np.random.default_rng(11)
    n, d, k = 4000, 48, 12
    mat = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    mask = rng.random(n) < 0.4

    index = DistributedScanIndex(mesh, d)
    index.load(mat)
    norms = np.linalg.norm(mat, axis=1)
    for m in (None, mask):
        vals, idx = index.search(queries, k, mask=m)
        for b in range(queries.shape[0]):
            qn = queries[b] / np.linalg.norm(queries[b])
            oracle = (mat @ qn) / norms
            cand = np.arange(n) if m is None else np.nonzero(m)[0]
            order = cand[np.argsort(-oracle[cand])][:k]
            np.testing.assert_array_equal(np.sort(idx[b]), np.sort(order))


def test_pod_mesh_incremental_update():
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import pod_mesh

    mesh = pod_mesh(2, 4)
    rng = np.random.default_rng(12)
    idx = DistributedScanIndex(mesh, 16)
    base = rng.standard_normal((512, 16)).astype(np.float32)
    idx.load(base)
    extra = rng.standard_normal((8, 16)).astype(np.float32)
    idx.update(extra, 512, 520)
    vals, ids = idx.search(extra[3][None, :], 1)
    assert ids[0, 0] == 515
