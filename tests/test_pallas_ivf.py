"""Paged Pallas IVF probe must match the XLA IVF search exactly (interpret
mode on CPU; compiled on TPU via bench/drive runs)."""

import numpy as np

import jax.numpy as jnp

from minivectordb_tpu.ops.ivf import IVFIndex, _ivf_search
from minivectordb_tpu.ops.pallas_ivf import pallas_ivf_search


def test_pallas_ivf_matches_xla_path():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((3000, 128)).astype(np.float32)
    index = IVFIndex(nlist=16, nprobe=6, iters=5)
    index.build(mat)
    q = jnp.asarray(rng.standard_normal((5, 128)).astype(np.float32))

    xv, xi = _ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 6, 10,
    )
    pv, pi = pallas_ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 6, 10,
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5,
                               atol=1e-6)


def test_pallas_ivf_query_chunking():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((2000, 128)).astype(np.float32)
    index = IVFIndex(nlist=8, nprobe=4, iters=3)
    index.build(mat)
    q = jnp.asarray(rng.standard_normal((70, 128)).astype(np.float32))  # > chunk

    xv, xi = _ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 4, 5,
    )
    pv, pi = pallas_ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 4, 5,
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_grouped_empty_slots_never_win_when_scores_negative(monkeypatch):
    """Mask-ordering regression: empty/padded list slots carry
    list_inv == 0, and the int8 kernel epilogue reconstructs cosine as
    dots * list_inv * q_inv BEFORE masking — if masking ran first (or the
    mask were dropped), an empty slot would score exactly 0.0. Random-data
    tests can't see that (real top-k scores are positive); here every
    corpus vector anti-correlates with the query, so all true scores are
    ~-1 and any leaked empty slot would WIN the top-k with 0.0."""
    import minivectordb_tpu.ops.ivf as ivf_mod
    from minivectordb_tpu.ops.ivf import IVFIndex

    monkeypatch.setattr(ivf_mod, "_FORCE_PALLAS_ROUTE", True)
    rng = np.random.default_rng(7)
    n, d = 300, 128
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    # every row ~= -base + small noise: cos(row, base) ~ -1 for all rows
    mat = (-base[None, :] + 0.05 * rng.standard_normal((n, d))).astype(
        np.float32
    )
    for dtype in ("float32", "bfloat16", "int8"):
        index = IVFIndex(nlist=2, nprobe=2, iters=3, device_dtype=dtype)
        index.build(mat)
        snap = index.snapshot()
        # B=16 takes the grouped kernel; repeat the query so every group
        # slot is live
        q = np.tile(base, (16, 1)).astype(np.float32)
        vals, ids = snap.search(q, k=10)
        vals = np.asarray(vals)
        ids = np.asarray(ids)
        assert vals.max() < 0.0, (dtype, float(vals.max()))
        assert ids.min() >= 0 and ids.max() < n, (
            dtype, int(ids.min()), int(ids.max()),
        )


def test_snapshot_tpu_route_integration_interpreted(monkeypatch):
    """Exercise IVFSnapshot.search's TPU branch END TO END on CPU (kernels
    interpret): grouped route (B>=16) and per-pair route (small B), f32 and
    bf16+rescore, with and without a filter mask — vs the exact oracle at
    exhaustive probe. The unit kernel tests can't catch kwide/selector/mask
    plumbing bugs in the snapshot itself; this does, without a chip."""
    import jax
    import minivectordb_tpu.ops.ivf as ivf_mod
    from minivectordb_tpu.ops.ivf import IVFIndex

    monkeypatch.setattr(ivf_mod, "_FORCE_PALLAS_ROUTE", True)
    rng = np.random.default_rng(3)
    n, d = 2048, 128
    mat = rng.standard_normal((n, d)).astype(np.float32)
    norms = np.linalg.norm(mat, axis=1)

    def oracle(q, k, eligible=None):
        qn = q / np.linalg.norm(q)
        s = (mat @ qn) / norms
        if eligible is not None:
            s = np.where(eligible, s, -np.inf)
        return set(np.argsort(-s)[:k].tolist())

    mask = (np.arange(n) % 4) != 3  # 75% eligible
    mask_dev = jnp.asarray(mask)
    for dtype in ("float32", "bfloat16", "int8"):
        index = IVFIndex(nlist=8, nprobe=8, iters=4, device_dtype=dtype)
        index.build(mat)
        snap = index.snapshot()
        for B in (16, 2):  # grouped route / per-pair route
            q = rng.standard_normal((B, d)).astype(np.float32)
            vals, ids = snap.search(q, k=10)  # exhaustive probe -> exact-ish
            for b in range(B):
                got = set(int(x) for x in ids[b])
                assert len(got & oracle(q[b], 10)) >= 9, (dtype, B, b)
            fvals, fids = snap.search(
                q, k=10, mask_dev=mask_dev, mask_frac=0.75
            )
            for b in range(B):
                got = [int(x) for x, v in zip(fids[b], fvals[b])
                       if v > -1.0e38]
                assert all(mask[r] for r in got), (dtype, B, b)
                assert len(set(got) & oracle(q[b], 10, mask)) >= 9, (
                    dtype, B, b,
                )
