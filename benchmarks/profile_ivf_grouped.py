"""Round-3 IVF rework profiling: grouped batch-first probe vs the old
per-pair kernel vs the exact scan, at the config5 point (1M x 1024).

Everything heavy stays ON DEVICE: the clustered corpus is generated with a
jitted program (no multi-GB host upload through the dev tunnel), recall is
measured against the exact Pallas scan's top-10 (the oracle by definition),
and only int32 bookkeeping ever crosses the host boundary.

Usage: python benchmarks/profile_ivf_grouped.py [--n 1000000] [--d 1024]
Prints one JSON dict at the end.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, reps=None):
    reps = reps or int(os.environ.get("PROFILE_REPS", "3"))
    jax.block_until_ready(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=("cap", "d", "n"))
def _make_corpus(centers, asg, cap, d, n):
    """Chunked on-device generation: one fori_loop writing 64k-row slabs
    into a preallocated buffer. A single threefry program for the whole
    (cap, d) tensor compiles pathologically slowly over the dev tunnel
    (observed: >20 min wedged); the loop body compiles in seconds and the
    transient stays at chunk x d."""
    chunk = 1 << 16
    assert cap % chunk == 0

    def body(i, out):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        noise = jax.random.normal(key, (chunk, d), jnp.float32)
        a = jax.lax.dynamic_slice_in_dim(asg, i * chunk, chunk)
        rows = centers[a] + noise
        ridx = i * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, 1), 0
        )
        rows = jnp.where(ridx < n, rows, 0.0)
        return jax.lax.dynamic_update_slice_in_dim(out, rows, i * chunk, 0)

    return jax.lax.fori_loop(
        0, cap // chunk, body, jnp.zeros((cap, d), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("nq", "d"))
def _make_queries(buf, idx, nq, d):
    noise = jax.random.normal(jax.random.PRNGKey(9), (nq, d), jnp.float32)
    return buf[idx] + 0.1 * noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--nprobes", default="8,32,64")
    ap.add_argument("--groups", default="32")
    ap.add_argument("--with-old", action="store_true")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--rescore", action="store_true",
                    help="two-stage: quantized top-K' then exact f32 rescore")
    ap.add_argument("--kwide", type=int, default=40,
                    help="stage-1 candidate width for --rescore")
    ap.add_argument("--selector", default="exact",
                    choices=("exact", "approx"),
                    help="stage-1 top-k selector (approx = TPU ApproxTopK; "
                    "only sane with --rescore)")
    args = ap.parse_args()

    from minivectordb_tpu.ops.ivf import IVFIndex, _exact_rescore
    from minivectordb_tpu.ops.pallas_ivf import (
        pallas_ivf_search,
        pallas_ivf_search_grouped,
    )
    from minivectordb_tpu.ops import scan as scan_ops
    from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk

    rng = np.random.default_rng(0)
    n, d = args.n, args.d
    cap = scan_ops.capacity_bucket(n, 1024)
    n_centers = 1000
    centers = (rng.standard_normal((n_centers, d)) * 3).astype(np.float32)
    asg = rng.integers(0, n_centers, cap).astype(np.int32)
    print(f"generating {n}x{d} on device ...", flush=True)
    buf = _make_corpus(jnp.asarray(centers), jnp.asarray(asg), cap, d, n)
    inv = scan_ops.row_inv_norms(buf)
    jax.block_until_ready(inv)

    t0 = time.perf_counter()
    idx = IVFIndex(nlist=args.nlist, nprobe=32, iters=6,
                   device_dtype=args.dtype)
    idx.build(buf, count=n, inv_norms=inv)
    build_s = time.perf_counter() - t0
    print(f"build: {build_s:.1f}s  pad_len={idx.pad_len} "
          f"nlist_eff={idx.centroids.shape[0]}", flush=True)

    results = {"n": n, "d": d, "nlist_eff": int(idx.centroids.shape[0]),
               "pad_len": idx.pad_len, "dtype": args.dtype,
               "build_s": round(build_s, 1)}

    max_b = max(int(x) for x in args.batches.split(","))
    max_b = max(max_b, 1024)
    qidx = jnp.asarray(rng.integers(0, n, max_b).astype(np.int32))
    qall = _make_queries(buf, qidx, max_b, d)
    jax.block_until_ready(qall)

    # oracle = exact device scan top-10 on the first 256 queries
    print("oracle via exact pallas scan...", flush=True)
    _, oid = pallas_scan_topk(buf, inv, qall[:256], n, 16)
    oracle = [set(np.asarray(oid)[i, :10].tolist()) for i in range(256)]

    lists, list_ids, list_valid = idx._tables
    cent = idx.centroids
    linv = idx._list_inv

    for b in [int(x) for x in args.batches.split(",")]:
        q = qall[:b]
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            row = {}
            for g in [int(x) for x in args.groups.split(",")]:
                if args.rescore:
                    fn = lambda: _exact_rescore(
                        buf, inv, q,
                        *pallas_ivf_search_grouped(
                            cent, lists, list_ids, list_valid, q, nprobe,
                            args.kwide, g, list_inv=linv,
                            selector=args.selector),
                        10)
                else:
                    fn = lambda: pallas_ivf_search_grouped(
                        cent, lists, list_ids, list_valid, q, nprobe, 10, g,
                        list_inv=linv)
                dt = timeit(fn)
                row[f"grouped_g{g}_qps"] = round(b / dt, 1)
                if g == int(args.groups.split(",")[0]):
                    vals, ids = map(np.asarray, fn())
                    rec = np.mean([
                        len(set(ids[i, :10].tolist()) & oracle[i]) / 10
                        for i in range(min(b, 256))
                    ])
                    row["recall_at_10"] = round(float(rec), 4)
            if args.with_old and b <= 256:
                fn_old = lambda: pallas_ivf_search(
                    cent, lists, list_ids, list_valid, q, nprobe, 10)
                row["old_pair_qps"] = round(b / timeit(fn_old), 1)
            results[f"b{b}_np{nprobe}"] = row
            print(f"b={b} nprobe={nprobe}: {row}", flush=True)

    if not args.skip_exact:
        for b in [int(x) for x in args.batches.split(",")]:
            q = qall[:b]
            fn = lambda: pallas_scan_topk(buf, inv, q, n, 16)
            dt = timeit(fn)
            results[f"exact_b{b}_qps"] = round(b / dt, 1)
            print(f"exact b={b}: {b/dt:.1f} QPS", flush=True)

    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
