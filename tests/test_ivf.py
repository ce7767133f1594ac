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
