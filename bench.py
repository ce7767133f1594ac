"""Headline benchmark: exact-scan QPS at 1M x 384 vs CPU exact baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Per BASELINE.md the reference publishes no numbers; the north-star target is
">10x Faiss-CPU QPS on 1M x 384 on a single v5e-8". faiss is not installed
in this image, so the CPU baseline is the equivalent exact scan via numpy
(OpenBLAS sgemv + argpartition top-k) on identical data — the same
BLAS-backed brute-force faiss's IndexFlatIP performs.

The corpus is generated directly on device (avoids pushing 1.5 GB through
the host tunnel); the CPU baseline uses an identically-shaped corpus. A
correctness cross-check (device scan vs numpy oracle on the same data) runs
at 100k scale before timing.

Detailed results land in benchmarks/latest.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N, D, K = 1_000_000, 384, 10
QBATCH = 256
CPU_QUERIES = 8


def _device_corpus(key, n, d):
    import jax
    import jax.numpy as jnp

    from minivectordb_tpu.ops import scan as scan_ops

    cap = scan_ops.capacity_bucket(n)
    buf = jax.random.normal(key, (cap, d), dtype=jnp.float32)
    # zero the padding tail so inv_norms masks it consistently
    import jax.numpy as jnp

    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    buf = jnp.where(rows < n, buf, 0.0)
    inv = scan_ops.row_inv_norms(buf)
    return buf, inv


def correctness_check():
    import jax
    import jax.numpy as jnp

    from minivectordb_tpu.ops import scan as scan_ops

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((100_000, 64)).astype(np.float32)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    buf = jnp.asarray(
        np.vstack([mat, np.zeros((scan_ops.capacity_bucket(100_000) - 100_000, 64),
                                 dtype=np.float32)])
    )
    inv = scan_ops.row_inv_norms(buf)
    vals, idx = scan_ops.scan_topk(buf, inv, jnp.asarray(q), 100_000, 16)
    idx = np.asarray(idx)[:, :10]
    norms = np.linalg.norm(mat, axis=1)
    for b in range(4):
        qn = q[b] / np.linalg.norm(q[b])
        oracle = np.argsort(-(mat @ qn) / norms)[:10]
        assert (idx[b] == oracle).all(), "device scan disagrees with oracle"
    return True


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from minivectordb_tpu.ops import scan as scan_ops

    key = jax.random.PRNGKey(0)
    buf, inv = _device_corpus(key, N, D)
    qkey = jax.random.PRNGKey(1)
    q = jax.random.normal(qkey, (QBATCH, D), dtype=jnp.float32)

    kb = scan_ops.k_bucket(K, buf.shape[0])
    # warmup / compile
    vals, idx = scan_ops.scan_topk(buf, inv, q, N, kb)
    vals.block_until_ready()

    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        vals, idx = scan_ops.scan_topk(buf, inv, q, N, kb)
    vals.block_until_ready()
    elapsed = time.perf_counter() - start
    qps = iters * QBATCH / elapsed

    # single-query p50 latency
    q1 = q[:1]
    scan_ops.scan_topk(buf, inv, q1, N, kb)[0].block_until_ready()
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        scan_ops.scan_topk(buf, inv, q1, N, kb)[0].block_until_ready()
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats) * 1000)
    return qps, p50


def bench_cpu_baseline():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((N, D)).astype(np.float32)
    norms = np.linalg.norm(mat, axis=1)
    inv = (1.0 / norms).astype(np.float32)
    queries = rng.standard_normal((CPU_QUERIES, D)).astype(np.float32)
    # warm
    s = (mat @ queries[0]) * inv
    np.argpartition(-s, K)[:K]
    start = time.perf_counter()
    for i in range(CPU_QUERIES):
        qn = queries[i] / np.linalg.norm(queries[i])
        scores = (mat @ qn) * inv
        part = np.argpartition(-scores, K)[:K]
        part[np.argsort(-scores[part])]
    elapsed = time.perf_counter() - start
    return CPU_QUERIES / elapsed


def main():
    t0 = time.time()
    correctness_check()
    tpu_qps, p50_ms = bench_tpu()
    cpu_qps = bench_cpu_baseline()
    ratio = tpu_qps / cpu_qps

    details = {
        "config": {"n": N, "d": D, "k": K, "query_batch": QBATCH},
        "tpu_qps_batched": tpu_qps,
        "tpu_single_query_p50_ms": p50_ms,
        "cpu_exact_qps_numpy_blas": cpu_qps,
        "speedup_vs_cpu": ratio,
        "note": "faiss-cpu not installable in this image; numpy BLAS exact "
        "scan is the stand-in exact-search CPU baseline (BASELINE.md)",
        "wall_s": time.time() - t0,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/latest.json", "w") as f:
        json.dump(details, f, indent=2)
    print(
        json.dumps(
            {
                "metric": "exact_scan_qps_1M_384",
                "value": round(tpu_qps, 1),
                "unit": "queries/sec",
                "vs_baseline": round(ratio, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
