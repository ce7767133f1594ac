"""Headline benchmark: exact-scan QPS at 1M x 384 vs CPU exact baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Per BASELINE.md the reference publishes no numbers; the north-star target is
">10x Faiss-CPU QPS on 1M x 384 on a single v5e-8". faiss is not installable
in this image, so the CPU baseline is the equivalent exact scan via numpy
(BLAS sgemv + argpartition top-k) on this host — the same brute-force
IndexFlatIP computes. The headline value is the EXACT float32 mode
(recall@10 == 1.0 by construction, verified against a numpy oracle before
timing); faster recall-tradeoff modes (TPU ApproxTopK recall~0.997, bfloat16
corpus) are reported in benchmarks/latest.json.

The corpus is generated directly on device (pushing 1.5 GB through the host
tunnel would dominate setup).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N, D, K = 1_000_000, 384, 10
QBATCH = 256
CPU_QUERIES = 4


def _setup_device_corpus():
    import jax
    import jax.numpy as jnp

    from minivectordb_tpu.ops import scan as scan_ops

    cap = scan_ops.capacity_bucket(N)
    buf = jax.random.normal(jax.random.PRNGKey(0), (cap, D), dtype=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    buf = jnp.where(rows < N, buf, 0.0)
    inv = scan_ops.row_inv_norms(buf)
    np.asarray(inv[:2])  # sync
    return buf, inv


def correctness_check():
    """Device exact scan vs numpy oracle on identical data (100k x 64)."""
    import jax.numpy as jnp

    from minivectordb_tpu.ops import scan as scan_ops

    rng = np.random.default_rng(0)
    n = 100_000
    mat = rng.standard_normal((n, 64)).astype(np.float32)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    pad = scan_ops.capacity_bucket(n) - n
    buf = jnp.asarray(np.vstack([mat, np.zeros((pad, 64), dtype=np.float32)]))
    inv = scan_ops.row_inv_norms(buf)
    vals, idx = scan_ops.scan_topk(buf, inv, jnp.asarray(q), n, 16)
    vals = np.asarray(vals)[:, :10]
    idx = np.asarray(idx)[:, :10]
    norms = np.linalg.norm(mat, axis=1)
    from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk

    pvals, pidx = pallas_scan_topk(buf, inv, jnp.asarray(q), n, 16)
    pvals = np.asarray(pvals)[:, :10]
    pidx = np.asarray(pidx)[:, :10]
    for b in range(4):
        qn = q[b] / np.linalg.norm(q[b])
        scores = (mat @ qn) / norms
        oracle = np.argsort(-scores)[:10]
        assert set(idx[b]) == set(oracle), "device scan disagrees with oracle"
        np.testing.assert_allclose(
            vals[b], np.sort(scores[oracle])[::-1], rtol=2e-5, atol=2e-5
        )
        assert set(pidx[b]) == set(oracle), "pallas scan disagrees with oracle"


def _time_scan(buf, inv, q, mode, iters):
    import jax

    from minivectordb_tpu.ops import scan as scan_ops

    r = scan_ops.scan_topk(buf, inv, q, N, 16, None, mode)
    jax.block_until_ready(r)
    np.asarray(r[0][:1, :1])
    t = time.perf_counter()
    for _ in range(iters):
        r = scan_ops.scan_topk(buf, inv, q, N, 16, None, mode)
    jax.block_until_ready(r)
    np.asarray(r[0][:1, :1])
    return (time.perf_counter() - t) / iters


def _time_pallas(buf, inv, q, iters):
    import jax

    from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk

    r = pallas_scan_topk(buf, inv, q, N, 16)
    jax.block_until_ready(r)
    np.asarray(r[0][:1, :1])
    t = time.perf_counter()
    for _ in range(iters):
        r = pallas_scan_topk(buf, inv, q, N, 16)
    jax.block_until_ready(r)
    np.asarray(r[0][:1, :1])
    return (time.perf_counter() - t) / iters


def bench_tpu(buf, inv):
    import jax
    import jax.numpy as jnp

    out = {}
    best_exact = 0.0
    for batch in (QBATCH, 1024):
        q = jax.random.normal(jax.random.PRNGKey(1), (batch, D), dtype=jnp.float32)
        dt_xla = _time_scan(buf, inv, q, "exact", 10)
        dt_pallas = _time_pallas(buf, inv, q, 10)
        out[f"exact_xla_qps_b{batch}"] = batch / dt_xla
        out[f"exact_pallas_qps_b{batch}"] = batch / dt_pallas
        best_exact = max(best_exact, batch / min(dt_xla, dt_pallas))
    q = jax.random.normal(jax.random.PRNGKey(1), (QBATCH, D), dtype=jnp.float32)
    dt_approx = _time_scan(buf, inv, q, "approx", 10)
    buf16 = buf.astype(jnp.bfloat16)
    dt_bf16 = _time_scan(buf16, inv, q, "approx", 10)
    dt_single = _time_scan(buf, inv, q[:1], "exact", 20)
    out.update(
        {
            # headline: best EXACT path (oracle-checked exact algorithms)
            "exact_qps": best_exact,
            "approx_qps": QBATCH / dt_approx,
            "bf16_approx_qps": QBATCH / dt_bf16,
            "single_query_p50_ms": dt_single * 1000,
        }
    )
    return out


def bench_cpu_baseline():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((N, D)).astype(np.float32)
    inv = (1.0 / np.linalg.norm(mat, axis=1)).astype(np.float32)
    queries = rng.standard_normal((CPU_QUERIES, D)).astype(np.float32)
    s = (mat @ queries[0]) * inv  # warm BLAS
    np.argpartition(-s, K)[:K]
    start = time.perf_counter()
    for i in range(CPU_QUERIES):
        qn = queries[i] / np.linalg.norm(queries[i])
        scores = (mat @ qn) * inv
        part = np.argpartition(-scores, K)[:K]
        part[np.argsort(-scores[part])]
    return CPU_QUERIES / (time.perf_counter() - start)


def main():
    t0 = time.time()
    correctness_check()
    buf, inv = _setup_device_corpus()
    tpu = bench_tpu(buf, inv)
    cpu_qps = bench_cpu_baseline()
    ratio = tpu["exact_qps"] / cpu_qps

    details = {
        "config": {"n": N, "d": D, "k": K, "query_batch": QBATCH},
        "tpu": tpu,
        "cpu_exact_qps_numpy_blas": cpu_qps,
        "speedup_exact_vs_cpu": ratio,
        "notes": [
            "headline = best exact float32 scan (recall@10 == 1.0, "
            "oracle-checked): Pallas two-phase subtile-max kernel vs XLA "
            "fused scan+TopK",
            "approx = TPU ApproxTopK recall_target 0.99 (measured ~0.997)",
            "bf16_approx = bfloat16 corpus + ApproxTopK (recall-tolerant mode)",
            "faiss-cpu not installable in this image; numpy BLAS exact scan "
            "is the stand-in CPU baseline (single-core host)",
        ],
        "wall_s": time.time() - t0,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/latest.json", "w") as f:
        json.dump(details, f, indent=2)
    print(
        json.dumps(
            {
                "metric": "exact_scan_qps_1M_384",
                "value": round(tpu["exact_qps"], 1),
                "unit": "queries/sec",
                "vs_baseline": round(ratio, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
