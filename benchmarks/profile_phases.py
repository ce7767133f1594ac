"""Profile the two-phase exact kernel's phases at 1M x 384 (real chip) to
size the phase-2 (top-k over subtile maxima) bottleneck before optimizing."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minivectordb_tpu.ops import scan as scan_ops
from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk, subtile_maxima

N, D = 1_000_000, 384
cap = scan_ops.capacity_bucket(N)
buf = jax.random.normal(jax.random.PRNGKey(0), (cap, D), dtype=jnp.float32)
rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
buf = jnp.where(rows < N, buf, 0.0)
inv = scan_ops.row_inv_norms(buf)
jax.block_until_ready(inv)
print("corpus ready", flush=True)


@jax.jit
def phase1(buf, inv, q):
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
    return subtile_maxima(buf, inv, qn, N, None)


@jax.jit
def phase12(buf, inv, q):
    m = phase1(buf, inv, q).T
    return jax.lax.top_k(m, 26)


def _sync(r):
    leaf = jax.tree.leaves(r)[0]
    np.asarray(leaf)[:1]  # force a device->host copy (tunnel-safe sync)


def t(f, *a, iters=10):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / iters


for b in (256, 1024):
    q = jax.random.normal(jax.random.PRNGKey(1), (b, D), dtype=jnp.float32)
    d1 = t(phase1, buf, inv, q)
    print("p1", d1, flush=True)
    d12 = t(phase12, buf, inv, q)
    print("p12", d12, flush=True)
    dall = t(lambda q: pallas_scan_topk(buf, inv, q, N, 16), q)
    print(
        f"B={b}: phase1 {d1*1e3:.2f} ms | phase1+2 {d12*1e3:.2f} ms "
        f"(p2 ~{(d12-d1)*1e3:.2f}) | full {dall*1e3:.2f} ms "
        f"(p3 ~{(dall-d12)*1e3:.2f}) | QPS full {b/dall:,.0f}",
        flush=True,
    )
