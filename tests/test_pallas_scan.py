"""Pallas two-phase exact scan vs numpy oracle (interpret mode on CPU;
compiled Mosaic on TPU — also exercised by bench/drive runs)."""

import numpy as np

import jax.numpy as jnp

from minivectordb_tpu.ops import scan as scan_ops
from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk


def test_pallas_scan_matches_oracle():
    rng = np.random.default_rng(0)
    n, d = 9000, 32
    cap = scan_ops.capacity_bucket(n)  # 16384 — divisible by ROW_TILE 4096
    mat = rng.standard_normal((n, d)).astype(np.float32)
    buf = jnp.asarray(np.vstack([mat, np.zeros((cap - n, d), np.float32)]))
    inv = scan_ops.row_inv_norms(buf)
    q = rng.standard_normal((3, d)).astype(np.float32)

    vals, idx = pallas_scan_topk(buf, inv, jnp.asarray(q), n, 8)
    vals, idx = np.asarray(vals), np.asarray(idx)
    norms = np.linalg.norm(mat, axis=1)
    for b in range(3):
        qn = q[b] / np.linalg.norm(q[b])
        scores = (mat @ qn) / norms
        oracle = np.argsort(-scores)[:8]
        assert set(idx[b].tolist()) == set(oracle.tolist())
        np.testing.assert_allclose(
            vals[b], np.sort(scores[oracle])[::-1], rtol=1e-4, atol=1e-4
        )


def test_pallas_scan_count_masking():
    """Rows beyond `count` must never be returned even though the padded
    buffer contains live-looking data there."""
    rng = np.random.default_rng(1)
    cap, d = 4096, 16
    full = rng.standard_normal((cap, d)).astype(np.float32)
    # make the padded zone maximally attractive
    q = rng.standard_normal((1, d)).astype(np.float32)
    full[3000:] = 100.0 * (q[0] / np.linalg.norm(q[0]))
    buf = jnp.asarray(full)
    inv = scan_ops.row_inv_norms(buf)
    vals, idx = pallas_scan_topk(buf, inv, jnp.asarray(q), 3000, 5)
    assert (np.asarray(idx)[0] < 3000).all()


def test_pallas_mixed_shadow_scan():
    """bf16 phase-1 shadow + f32 rescore: indices match exact, scores are
    full-precision (not bf16-rounded)."""
    rng = np.random.default_rng(2)
    n, d = 6000, 24
    cap = scan_ops.capacity_bucket(n)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    buf = jnp.asarray(np.vstack([mat, np.zeros((cap - n, d), np.float32)]))
    shadow = buf.astype(jnp.bfloat16)
    inv = scan_ops.row_inv_norms(buf)
    q = rng.standard_normal((2, d)).astype(np.float32)

    vals, idx = pallas_scan_topk(
        buf, inv, jnp.asarray(q), n, 8, scan_buf=shadow
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    norms = np.linalg.norm(mat, axis=1)
    for b in range(2):
        qn = q[b] / np.linalg.norm(q[b])
        scores = (mat @ qn) / norms
        oracle = np.argsort(-scores)[:8]
        assert set(idx[b].tolist()) == set(oracle.tolist())
        # rescored at f32: tight tolerance, NOT bf16 (~3e-3) granularity
        np.testing.assert_allclose(
            vals[b], np.sort(scores[oracle])[::-1], rtol=1e-5, atol=1e-5
        )


def test_store_mixed_mode_smoke():
    from minivectordb_tpu.core.store import VectorStore

    rng = np.random.default_rng(3)
    store = VectorStore(16, device_dtype="mixed")
    mat = rng.standard_normal((200, 16)).astype(np.float32)
    store.append(mat)
    vals, idx = store.search(mat[[5]], k=1)
    assert idx[0][0] == 5
    assert vals[0][0] > 0.99999
    # incremental append keeps shadow consistent
    store.append(rng.standard_normal((50, 16)).astype(np.float32))
    vals, idx = store.search(mat[[7]], k=1)
    assert idx[0][0] == 7


def test_pallas_int8_matches_xla_int8():
    """Int8 two-phase kernel must agree with the XLA int8 scan (same
    quantized metric) on indices and scores."""
    rng = np.random.default_rng(4)
    n, d = 5000, 32
    cap = scan_ops.capacity_bucket(n)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    host = jnp.asarray(np.vstack([mat, np.zeros((cap - n, d), np.float32)]))
    buf_i8, inv_i8 = scan_ops.update_rows_int8(
        jnp.zeros((cap, d), jnp.int8), jnp.zeros((cap,), jnp.float32), host, 0
    )
    q = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))

    from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk_int8

    pv, pi = pallas_scan_topk_int8(buf_i8, inv_i8, q, n, 8)
    ev, ei = scan_ops.scan_topk_int8(buf_i8, inv_i8, q, n, 8)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ei)[:, :8])
    np.testing.assert_allclose(
        np.asarray(pv), np.asarray(ev)[:, :8], rtol=1e-5, atol=1e-6
    )


def test_phase2_two_level_matches_direct_topk():
    """The supertile two-level phase-2 must select the same subtiles as a
    direct lax.top_k over all subtile maxima (exactness of the reduction)."""
    import jax

    from minivectordb_tpu.ops.pallas_scan import _phase2_topk_subtiles

    rng = np.random.default_rng(3)
    maxima = jnp.asarray(rng.standard_normal((4, 2048)).astype(np.float32))
    for n_sub in (8, 26, 63):
        two = np.asarray(_phase2_topk_subtiles(maxima, n_sub))
        _, direct = jax.lax.top_k(maxima, n_sub)
        for b in range(4):
            assert set(two[b].tolist()) == set(np.asarray(direct)[b].tolist())


def test_pallas_scan_exercises_two_level_phase2():
    """Corpus large enough that n_sub < n_supertiles (the two-level branch
    actually runs) stays oracle-exact."""
    rng = np.random.default_rng(4)
    n, d, k = 40_000, 16, 8
    cap = scan_ops.capacity_bucket(n)  # 65536 -> 2048 subtiles, 64 supertiles
    assert cap // 32 // 32 > k + 16  # two-level branch taken
    mat = rng.standard_normal((n, d)).astype(np.float32)
    buf = jnp.asarray(np.vstack([mat, np.zeros((cap - n, d), np.float32)]))
    inv = scan_ops.row_inv_norms(buf)
    q = rng.standard_normal((2, d)).astype(np.float32)
    vals, idx = pallas_scan_topk(buf, inv, jnp.asarray(q), n, k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    norms = np.linalg.norm(mat, axis=1)
    for b in range(2):
        qn = q[b] / np.linalg.norm(q[b])
        scores = (mat @ qn) / norms
        oracle = np.argsort(-scores)[:k]
        assert set(idx[b].tolist()) == set(oracle.tolist())


def test_pallas_scan_margin0_approx_mode():
    """margin=0 (the 'approx' search_mode route, core/store.py) gathers only
    k subtiles in phase 3; with identical f32 precision in both phases the
    selection argument still holds, so it stays oracle-exact here."""
    rng = np.random.default_rng(5)
    n, d, k = 20_000, 32, 8
    cap = scan_ops.capacity_bucket(n)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    buf = jnp.asarray(np.vstack([mat, np.zeros((cap - n, d), np.float32)]))
    inv = scan_ops.row_inv_norms(buf)
    q = rng.standard_normal((4, d)).astype(np.float32)
    vals, idx = pallas_scan_topk(buf, inv, jnp.asarray(q), n, k, margin=0)
    vals, idx = np.asarray(vals), np.asarray(idx)
    norms = np.linalg.norm(mat, axis=1)
    for b in range(4):
        qn = q[b] / np.linalg.norm(q[b])
        scores = (mat @ qn) / norms
        oracle = np.argsort(-scores)[:k]
        assert set(idx[b].tolist()) == set(oracle.tolist())


def test_pallas_scan_randomized_shape_sweep():
    """Randomized (capacity, dim, count, batch, k, mask) sweep vs the numpy
    oracle — guards the kernel's tiling/padding arithmetic across the whole
    eligible shape space, not just the hand-picked cases above (the round-2
    advisor found a non-power-of-two tile eligibility bug in exactly this
    class)."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        d = int(rng.choice([8, 16, 32, 64, 128]))
        cap_exp = int(rng.integers(9, 13))  # 512 .. 4096
        cap = 1 << cap_exp
        n = int(rng.integers(cap // 2, cap + 1))
        b = int(rng.choice([1, 2, 5, 16]))
        k = int(rng.choice([1, 4, 8, 16]))
        mat = rng.standard_normal((n, d)).astype(np.float32)
        buf = jnp.asarray(
            np.vstack([mat, np.zeros((cap - n, d), np.float32)])
        )
        inv = scan_ops.row_inv_norms(buf)
        q = rng.standard_normal((b, d)).astype(np.float32)
        use_mask = trial % 3 == 0
        mask = None
        keep = np.ones(n, dtype=bool)
        if use_mask:
            keep = rng.random(cap) < 0.5
            keep[n:] = False
            mask = jnp.asarray(keep)
        vals, idx = pallas_scan_topk(
            buf, inv, jnp.asarray(q), n, k, mask=mask
        )
        vals, idx = np.asarray(vals), np.asarray(idx)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        for row in range(b):
            qn = q[row] / np.linalg.norm(q[row])
            scores = (mat @ qn) / norms
            scores[~keep[:n]] = -np.inf
            n_valid = int(np.isfinite(scores).sum())
            kk = min(k, n_valid)
            oracle = np.argsort(-scores)[:kk]
            got_valid = [
                (i, v) for i, v in zip(idx[row], vals[row]) if v >= -1.0e38
            ]
            assert len(got_valid) >= kk, (trial, d, cap, n, b, k, row)
            got_ids = [i for i, _ in got_valid[:kk]]
            assert set(got_ids) == set(oracle.tolist()), (
                trial, d, cap, n, b, k, row
            )
            np.testing.assert_allclose(
                [v for _, v in got_valid[:kk]],
                np.sort(scores[oracle])[::-1],
                rtol=1e-4, atol=1e-4,
            )


def test_store_snapshot_tpu_route_integration_interpreted(monkeypatch):
    """Exercise StoreSnapshot._device_search's Pallas branch END TO END on
    CPU (kernels interpret, forced via MINIVECTORDB_TPU_FORCE_PALLAS):
    exact + approx modes, f32/mixed/int8 buffers, masked and unmasked, vs
    the numpy oracle — the snapshot-level plumbing (k bucketing, margin
    selection, mask padding) the kernel unit tests cannot see."""
    import numpy as np

    from minivectordb_tpu.core.store import VectorStore

    monkeypatch.setenv("MINIVECTORDB_TPU_FORCE_PALLAS", "1")
    rng = np.random.default_rng(11)
    n, d, B, k = 4096, 128, 16, 10
    mat = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((B, d)).astype(np.float32)
    mask = (np.arange(n) % 5) != 0
    norms = np.linalg.norm(mat, axis=1)

    def oracle(qb, eligible=None):
        s = (mat @ (qb / np.linalg.norm(qb))) / norms
        if eligible is not None:
            s = np.where(eligible, s, -np.inf)
        return set(np.argsort(-s)[:k].tolist())

    for dtype, floor in (("float32", 10), ("mixed", 10), ("int8", 9)):
        store = VectorStore(d, dtype)
        store.append(mat)
        snap = store.snapshot()
        for mode in ("exact", "approx"):
            vals, idx = snap._device_search(q, k, None, mode)
            for b in range(B):
                assert len(set(idx[b].tolist()) & oracle(q[b])) >= floor, (
                    dtype, mode, b,
                )
            mv, mi = snap._device_search(q, k, mask, mode)
            for b in range(B):
                got = [int(r) for r, v in zip(mi[b], mv[b]) if v > -1.0e38]
                assert all(mask[r] for r in got), (dtype, mode, b)
                assert len(set(got) & oracle(q[b], mask)) >= floor, (
                    dtype, mode, b,
                )
