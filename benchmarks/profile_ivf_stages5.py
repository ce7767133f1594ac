"""Stage-level breakdown of the config5 IVF search (1M x 1024, nlist 4096,
bf16 lists + exact rescore) — which device stage keeps pipelined IVF at
~31 ms/call when the probe math suggests single-digit ms. All timings are
pipelined (N dispatches, one drain) so they measure device throughput."""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, NLIST, NPROBE, B = 1_000_000, 1024, 4096, 32, 1024

def timed(fn, iters=8):
    fn()  # warm
    import jax
    r = fn(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [fn() for _ in range(iters)]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / iters

def main():
    import jax, jax.numpy as jnp
    from minivectordb_tpu.ops.ivf import IVFIndex, _exact_rescore
    from minivectordb_tpu.ops import scan as scan_ops
    from minivectordb_tpu.ops.pallas_ivf import pallas_ivf_search_grouped

    key = jax.random.PRNGKey(0)
    cap = scan_ops.capacity_bucket(N)
    centers = jax.random.normal(jax.random.PRNGKey(1), (1000, D)) * 3
    assign = jax.random.randint(jax.random.PRNGKey(2), (cap,), 0, 1000)
    buf = centers[assign] + jax.random.normal(key, (cap, D))
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    buf = jnp.where(rows < N, buf, 0.0).astype(jnp.float32)
    inv = scan_ops.row_inv_norms(buf)
    jax.block_until_ready(buf)
    print("corpus on device", flush=True)

    ivf = IVFIndex(nlist=NLIST, nprobe=NPROBE, iters=6, device_dtype="bfloat16")
    t0 = time.perf_counter()
    ivf.build(buf, count=N, inv_norms=inv)
    print("build", round(time.perf_counter() - t0, 1), flush=True)
    snap = ivf.snapshot()
    lists, list_ids, list_valid = snap.tables
    print("pad_len P =", lists.shape[1], "nlist_eff =", lists.shape[0], flush=True)

    q = jax.random.normal(jax.random.PRNGKey(3), (B, D), dtype=jnp.float32)
    out = {}
    out["full_search_ms"] = timed(lambda: snap.search(q, 10, fetch=False)) * 1e3
    print("full", out["full_search_ms"], flush=True)
    kwide = 40
    for g in (8, 16, 32, 64):
        for sel in ("approx", "exact"):
            dt = timed(lambda: pallas_ivf_search_grouped(
                snap.centroids, lists, list_ids, list_valid, q, NPROBE, kwide,
                group=g, selector=sel)) * 1e3
            out[f"probe_g{g}_{sel}_ms"] = dt
            print(f"probe g={g} {sel}: {dt:.2f} ms", flush=True)
    # rescore alone
    cand_ids = jax.random.randint(jax.random.PRNGKey(4), (B, kwide), 0, N).astype(jnp.int32)
    cand_vals = jnp.ones((B, kwide), jnp.float32)
    out["rescore_ms"] = timed(lambda: _exact_rescore(buf, inv, q, cand_vals, cand_ids, 10)) * 1e3
    print("rescore", out["rescore_ms"], flush=True)
    # centroid scan alone
    @jax.jit
    def cent(qq):
        qn = qq / jnp.maximum(jnp.linalg.norm(qq, axis=-1, keepdims=True), 1e-30)
        cs = jnp.dot(qn, snap.centroids.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(cs, NPROBE)
    out["centroid_topk_ms"] = timed(lambda: cent(q)) * 1e3
    print(json.dumps({k: round(v, 2) for k, v in out.items()}, indent=1))

if __name__ == "__main__":
    main()
