"""Time exact-f32 vs mixed (bf16 phase-1 shadow) at 1M x D, plus recall.

Usage: python benchmarks/profile_mixed.py [D] (default 384). PROFILE_REPS
controls timing reps (>=16 amortizes the dev-tunnel per-call sync).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minivectordb_tpu.ops import scan as scan_ops
from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk

D = int(sys.argv[1]) if len(sys.argv) > 1 else 384
N, K = 1_000_000, 16
cap = scan_ops.capacity_bucket(N)
buf = jax.random.normal(jax.random.PRNGKey(0), (cap, D), dtype=jnp.float32)
rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
buf = jnp.where(rows < N, buf, 0.0)
inv = scan_ops.row_inv_norms(buf)
shadow = buf.astype(jnp.bfloat16)
jax.block_until_ready(shadow)
print("ready", flush=True)


def _sync(r):
    np.asarray(jax.tree.leaves(r)[0])[:1, :1]


def t(f, iters=int(os.environ.get('PROFILE_REPS', '10'))):
    r = f()
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / iters


for b in (256, 1024):
    q = jax.random.normal(jax.random.PRNGKey(1), (b, D), dtype=jnp.float32)
    _, ei = pallas_scan_topk(buf, inv, q, N, K)
    ei = np.asarray(ei)

    def run(label, fn):
        dt = t(fn)
        _, idx = fn()
        idx = np.asarray(idx)
        rec = np.mean([len(set(ei[i]) & set(idx[i])) / K for i in range(b)])
        print(f"B={b} {label}: {dt*1e3:.2f} ms ({b/dt:,.0f} QPS) "
              f"recall@{K} {rec:.4f}", flush=True)

    run("exact_f32        ", lambda: pallas_scan_topk(buf, inv, q, N, K))
    run("approx_f32 (m=0) ", lambda: pallas_scan_topk(buf, inv, q, N, K,
                                                      margin=0))
    for m in (0, 4, 8, 16, 32):
        run(f"mixed (m={m:<2d})     ",
            lambda m=m: pallas_scan_topk(buf, inv, q, N, K, scan_buf=shadow,
                                         margin=m))
    run("bf16 buf (m=16)  ", lambda: pallas_scan_topk(shadow, inv, q, N, K,
                                                      margin=16))
    run("bf16 buf (m=0)   ", lambda: pallas_scan_topk(shadow, inv, q, N, K,
                                                      margin=0))
