"""Round-3 IVF rework profiling: grouped batch-first probe vs the old
per-pair kernel vs the exact scan, at the config5 point (1M x 1024).

Usage: python benchmarks/profile_ivf_grouped.py [--n 1000000] [--d 1024]
Prints one JSON dict at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, reps=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batches", default="256,1024")
    ap.add_argument("--nprobes", default="8,32,64")
    ap.add_argument("--groups", default="32")
    ap.add_argument("--skip-old", action="store_true")
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()

    from minivectordb_tpu.ops.ivf import IVFIndex
    from minivectordb_tpu.ops.pallas_ivf import (
        pallas_ivf_search,
        pallas_ivf_search_grouped,
    )
    from minivectordb_tpu.ops import scan as scan_ops

    rng = np.random.default_rng(0)
    n, d = args.n, args.d
    print(f"building corpus {n}x{d} ...", flush=True)
    # clustered corpus (like config5): centers + noise
    n_centers = 1000
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 3
    asg = rng.integers(0, n_centers, n)
    mat = centers[asg] + rng.standard_normal((n, d)).astype(np.float32)

    t0 = time.perf_counter()
    idx = IVFIndex(nlist=args.nlist, nprobe=32, iters=6,
                   device_dtype=args.dtype)
    idx.build(mat)
    build_s = time.perf_counter() - t0
    print(f"build: {build_s:.1f}s  pad_len={idx.pad_len} "
          f"nlist_eff={idx.centroids.shape[0]}", flush=True)

    results = {"n": n, "d": d, "nlist_eff": int(idx.centroids.shape[0]),
               "pad_len": idx.pad_len, "dtype": args.dtype,
               "build_s": round(build_s, 1)}

    # oracle for recall on 256 queries
    qall = mat[rng.integers(0, n, 1024)] + 0.1 * rng.standard_normal(
        (1024, d)).astype(np.float32)
    qn = qall / np.linalg.norm(qall, axis=1, keepdims=True)
    matn_norms = np.linalg.norm(mat, axis=1)
    print("computing oracle (host sgemm, 256 queries)...", flush=True)
    oracle = []
    for lo in range(0, 256, 64):  # one sgemm per 64 queries, not 1 gemv each
        s = (mat @ qn[lo : lo + 64].T) / matn_norms[:, None]  # (n, 64)
        part = np.argpartition(-s, 10, axis=0)[:10]
        oracle.extend(set(part[:, j].tolist()) for j in range(64))

    lists, list_ids, list_valid = idx._tables
    cent = idx.centroids

    for b in [int(x) for x in args.batches.split(",")]:
        q = jnp.asarray(qall[:b])
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            row = {}
            for g in [int(x) for x in args.groups.split(",")]:
                fn = lambda: pallas_ivf_search_grouped(
                    cent, lists, list_ids, list_valid, q, nprobe, 10, g)
                dt = timeit(fn)
                row[f"grouped_g{g}_qps"] = round(b / dt, 1)
                if g == int(args.groups.split(",")[0]):
                    vals, ids = map(np.asarray, fn())
                    rec = np.mean([
                        len(set(ids[i, :10].tolist()) & oracle[i]) / 10
                        for i in range(min(b, 256))
                    ])
                    row["recall_at_10"] = round(float(rec), 4)
            if not args.skip_old and b <= 256:
                fn_old = lambda: pallas_ivf_search(
                    cent, lists, list_ids, list_valid, q, nprobe, 10)
                row["old_pair_qps"] = round(b / timeit(fn_old), 1)
            results[f"b{b}_np{nprobe}"] = row
            print(f"b={b} nprobe={nprobe}: {row}", flush=True)

    if not args.skip_exact:
        # exact Pallas scan at the same point
        from minivectordb_tpu.ops.pallas_scan import pallas_scan_topk
        cap = scan_ops.capacity_bucket(n, 1024)
        padded = np.zeros((cap, d), np.float32)
        padded[:n] = mat
        del mat
        buf = scan_ops.chunked_device_put(padded)
        del padded
        inv = scan_ops.row_inv_norms(buf)
        for b in [int(x) for x in args.batches.split(",")]:
            q = jnp.asarray(qall[:b])
            fn = lambda: pallas_scan_topk(buf, inv, q, n, 16, None)
            dt = timeit(fn)
            results[f"exact_b{b}_qps"] = round(b / dt, 1)
            print(f"exact b={b}: {b/dt:.1f} QPS", flush=True)

    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
