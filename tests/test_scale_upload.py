"""Large-corpus upload machinery: linear capacity buckets past 2^21 rows,
streamed full uploads (no full-width f32 device intermediate), and host-side
quantization so bulk transfers carry the stored bytes.

The 10M-row behavior itself can only run on real hardware (benchmarks
config6); these tests pin the machinery at small sizes by shrinking the
upload slab so multi-slab streaming executes, and by checking the host
quantizers are bit-identical to the device update programs they mirror.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minivectordb_tpu.ops import scan as scan_ops


STEP = scan_ops._LINEAR_BUCKET_STEP


def test_capacity_bucket_pow2_below_linear_tier():
    assert scan_ops.capacity_bucket(1, 1024) == 1024
    assert scan_ops.capacity_bucket(1025, 1024) == 2048
    assert scan_ops.capacity_bucket(3, 8) == 8
    assert scan_ops.capacity_bucket(STEP, 1024) == STEP


def test_capacity_bucket_linear_above_tier():
    assert scan_ops.capacity_bucket(STEP + 1, 1024) == 2 * STEP
    assert scan_ops.capacity_bucket(2 * STEP, 1024) == 2 * STEP
    # 10M rows pads to 5 multiples (10.49M), not the pow2 16.8M
    assert scan_ops.capacity_bucket(10_000_000, 1024) == 5 * STEP
    assert 5 * STEP < 16 * 1024 * 1024


def test_capacity_bucket_monotone_and_tile_aligned():
    prev = 0
    for n in [1, 1000, 2048, STEP - 1, STEP, STEP + 1, 3 * STEP - 5,
              3 * STEP, 10_000_000, 20_000_000]:
        c = scan_ops.capacity_bucket(n, 1024)
        assert c >= n
        assert c >= prev  # monotone: callers clamp padded writes with it
        assert c % 4096 == 0 or c < 4096  # Pallas row tiles divide it
        prev = c


def test_host_int8_quantizer_matches_device_program():
    rng = np.random.default_rng(7)
    rows = rng.standard_normal((64, 48)).astype(np.float32)
    rows[5] = 0.0  # all-zero row -> inorm 0
    ri_h, inorm_h = scan_ops.quantize_rows_int8_host(rows)
    buf = jnp.zeros((64, 48), jnp.int8)
    inv = jnp.zeros((64,), jnp.float32)
    ri_d, inorm_d = scan_ops.update_rows_int8_nodonate(
        buf, inv, jnp.asarray(rows), 0
    )
    np.testing.assert_array_equal(ri_h, np.asarray(ri_d))
    np.testing.assert_allclose(inorm_h, np.asarray(inorm_d), rtol=1e-6)
    assert inorm_h[5] == 0.0


def test_host_bf16_cast_matches_device_program():
    rng = np.random.default_rng(8)
    rows = rng.standard_normal((32, 40)).astype(np.float32)
    rb_h, inorm_h = scan_ops.cast_rows_bf16_host(rows)
    buf = jnp.zeros((32, 40), jnp.bfloat16)
    inv = jnp.zeros((32,), jnp.float32)
    rb_d, inorm_d = scan_ops.update_rows_nodonate(
        buf, inv, jnp.asarray(rows), 0
    )
    np.testing.assert_array_equal(
        np.asarray(rb_h).view(np.uint16), np.asarray(rb_d).view(np.uint16)
    )
    np.testing.assert_allclose(inorm_h, np.asarray(inorm_d), rtol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "mixed", "bfloat16", "int8"])
def test_streamed_full_upload_matches_oracle(monkeypatch, dtype):
    """Force multi-slab streaming (tiny slab) and check search results
    against the numpy oracle — covers the slab loop, the shifted final
    window, and the host-quantized write path end to end."""
    from minivectordb_tpu.core.store import VectorStore

    monkeypatch.setattr(scan_ops, "_UPLOAD_SLAB_BYTES", 4096)
    rng = np.random.default_rng(11)
    n, d, k = 900, 32, 8
    mat = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)

    store = VectorStore(d, device_dtype=dtype)
    store.append(mat)
    assert scan_ops.upload_slab_rows(d, 1) < n  # streaming actually splits
    vals, idx = store.search(q, k, mode="exact")
    vals, idx = np.asarray(vals), np.asarray(idx)

    norms = np.linalg.norm(mat, axis=1)
    for b in range(2):
        qn = q[b] / np.linalg.norm(q[b])
        oracle = (mat @ qn) / norms
        expected = set(np.argsort(-oracle)[:k].tolist())
        if dtype in ("float32", "mixed"):
            assert set(idx[b].tolist()) == expected
        else:
            # quantized modes: overlap-heavy, scores close
            assert len(expected & set(idx[b].tolist())) >= k - 2
            np.testing.assert_allclose(
                vals[b], oracle[idx[b]], rtol=0.05, atol=0.05
            )


def test_streamed_upload_stale_rows_stay_masked(monkeypatch):
    """After deletes shrink the corpus, a full re-upload streams slabs that
    may include stale host-mirror rows beyond count — they must never
    surface in search results."""
    from minivectordb_tpu.core.store import VectorStore

    monkeypatch.setattr(scan_ops, "_UPLOAD_SLAB_BYTES", 4096)
    rng = np.random.default_rng(12)
    d = 32
    mat = rng.standard_normal((3000, d)).astype(np.float32)
    store = VectorStore(d, device_dtype="float32")
    store.append(mat)
    store.search(mat[:1], 4)  # populate device cache at cap 4096
    # shrink to 100 rows -> capacity bucket drops -> full re-upload
    store.delete_rows(np.arange(100, 3000))
    assert store.count == 100
    vals, idx = store.search(mat[:2], 10)
    idx = np.asarray(idx)
    assert idx.max() < 100


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_mesh_load_update_host_quantized(dtype):
    """Mesh buffers built from the host quantizers must agree with the
    single-chip store (identical stored bytes) and track updates."""
    from minivectordb_tpu.core.store import VectorStore
    from minivectordb_tpu.parallel.dist_scan import DistributedScanIndex
    from minivectordb_tpu.parallel.mesh import search_mesh

    assert jax.device_count() >= 8
    mesh = search_mesh(8)
    rng = np.random.default_rng(13)
    n, d, k = 4000, 32, 10
    mat = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((3, d)).astype(np.float32)

    dist = DistributedScanIndex(mesh, d, device_dtype=dtype)
    dist.load(mat)
    store = VectorStore(d, device_dtype=dtype)
    store.append(mat)

    dv, di = dist.search(q, k)
    sv, si = store.search(q, k, mode="exact")
    dv, di = np.asarray(dv), np.asarray(di)
    sv, si = np.asarray(sv), np.asarray(si)
    # same stored bytes -> same scores; ties may order differently
    np.testing.assert_allclose(np.sort(dv, -1), np.sort(sv, -1), rtol=1e-5,
                               atol=1e-6)
    for b in range(3):
        assert len(set(di[b]) & set(si[b])) >= k - 1

    # dirty-range update: replace 50 rows with a known strong match
    upd = np.tile(q[0] / np.linalg.norm(q[0]), (50, 1)).astype(np.float32)
    dist.update(upd, 100, n)
    uv, ui = dist.search(q[:1], 5)
    ui = np.asarray(ui)
    assert all(100 <= r < 150 for r in ui[0])
