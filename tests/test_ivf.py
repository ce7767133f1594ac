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
