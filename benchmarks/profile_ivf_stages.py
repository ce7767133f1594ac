"""Stage-by-stage decomposition of the grouped IVF probe at the config5
point: centroid top-k + bookkeeping | grouped_q gather | Pallas kernel |
selection + top-k | exact rescore. Each stage is timed as a separately
jitted program over the SAME inputs, so the sum approximates the fused
pipeline and the big term names the bottleneck.

Usage: python benchmarks/profile_ivf_stages.py [--nlist 1024] [--dtype int8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.profile_ivf_grouped import _make_corpus, _make_queries, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--group", type=int, default=16)
    ap.add_argument("--kwide", type=int, default=40)
    args = ap.parse_args()

    from minivectordb_tpu.ops.ivf import IVFIndex, _exact_rescore
    from minivectordb_tpu.ops import scan as scan_ops
    from minivectordb_tpu.ops.pallas_ivf import (
        _exclusive_cumsum,
        _grouped_scores,
    )

    rng = np.random.default_rng(0)
    n, d, b, nprobe, g = args.n, args.d, args.b, args.nprobe, args.group
    cap = scan_ops.capacity_bucket(n, 1024)
    centers = (rng.standard_normal((1000, d)) * 3).astype(np.float32)
    asg = rng.integers(0, 1000, cap).astype(np.int32)
    print(f"generating {n}x{d} ...", flush=True)
    buf = _make_corpus(jnp.asarray(centers), jnp.asarray(asg), cap, d, n)
    inv = scan_ops.row_inv_norms(buf)
    jax.block_until_ready(inv)
    idx = IVFIndex(nlist=args.nlist, nprobe=nprobe, iters=6,
                   device_dtype=args.dtype)
    idx.build(buf, count=n, inv_norms=inv)
    lists, list_ids, list_valid = idx._tables
    cent = idx.centroids
    linv = idx._list_inv
    l, p, _ = lists.shape
    print(f"built: nlist_eff={l} pad={p}", flush=True)

    q = _make_queries(buf, jnp.asarray(
        rng.integers(0, n, b).astype(np.int32)), b, d)[:b]
    jax.block_until_ready(q)

    # ---- stage 0: dispatch-overhead floor (trivial program, same q input)
    @jax.jit
    def stage0(q):
        return jnp.sum(q[:1, :8])

    stage0(q)
    dt0 = timeit(lambda: stage0(q))
    print(f"stage0 dispatch floor: {dt0*1e3:.2f} ms", flush=True)

    # ---- stage 1: normalize + centroid scores + top-nprobe + bookkeeping
    @jax.jit
    def stage1(q):
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                             1e-30)
        cs = jnp.dot(qn, cent.T, preferred_element_type=jnp.float32)
        _, probe = jax.lax.top_k(cs, nprobe)
        probe = probe.astype(jnp.int32)
        m = b * nprobe
        l_flat = probe.reshape(-1)
        q_flat = jax.lax.broadcasted_iota(
            jnp.int32, (b, nprobe), 0).reshape(-1)
        order = jnp.argsort(l_flat)
        ls = l_flat[order]
        qs = q_flat[order]
        counts = jax.ops.segment_sum(
            jnp.ones((m,), jnp.int32), ls, num_segments=l)
        starts = _exclusive_cumsum(counts)
        rank = jnp.arange(m, dtype=jnp.int32) - starts[ls]
        gid = _exclusive_cumsum((counts + g - 1) // g)[ls] + rank // g
        slot = rank % g
        n_steps = int(min(l, m) + m // g)
        step_list = jnp.full((n_steps,), -1, jnp.int32).at[gid].set(ls)
        step_q = jnp.zeros((n_steps, g), jnp.int32).at[gid, slot].set(qs)
        inv_gid = jnp.zeros((m,), jnp.int32).at[order].set(gid)
        inv_slot = jnp.zeros((m,), jnp.int32).at[order].set(slot)
        if lists.dtype == jnp.int8:
            qi = jnp.clip(jnp.round(qn * 127.0), -127, 127)
            qd = qi.astype(jnp.int8)
        else:
            qd = qn.astype(lists.dtype)
        return (qn, qd, probe, step_list, step_q,
                inv_gid.reshape(b, nprobe), inv_slot.reshape(b, nprobe))

    s1 = stage1(q)
    dt1 = timeit(lambda: stage1(q))
    qn, qd, probe, step_list, step_q, pair_step, pair_slot = s1
    n_steps = int(step_list.shape[0])
    real_steps = int((np.asarray(step_list) >= 0).sum())
    print(f"stage1 bookkeeping: {dt1*1e3:.2f} ms  "
          f"(steps {n_steps}, real {real_steps})", flush=True)

    # ---- stage 2: grouped_q gather
    @jax.jit
    def stage2(qd, step_q):
        return qd[step_q]

    gq = stage2(qd, step_q)
    dt2 = timeit(lambda: stage2(qd, step_q))
    print(f"stage2 grouped_q gather {tuple(gq.shape)}: {dt2*1e3:.2f} ms",
          flush=True)

    # ---- stage 3: the Pallas kernel (jit-wrapped with lists as an ARGUMENT:
    # closing over the 1 GB list tensor ships it as a compile-time constant
    # to the remote compiler — HTTP 413). Validity masking + (int8) cosine
    # scaling run in the kernel epilogue now, so stage 3 absorbs what used
    # to be stage 4's (B, nprobe, P) gathers.
    from minivectordb_tpu.ops.pallas_ivf import _grouped_scores_q

    if lists.dtype == jnp.int8:
        @jax.jit
        def qinv_of(qn, step_q):
            qi = jnp.clip(jnp.round(qn * 127.0), -127, 127)
            return (1.0 / jnp.maximum(
                jnp.sqrt(jnp.sum(qi * qi, axis=-1)), 1e-30))[step_q]

        gqinv = qinv_of(qn, step_q)
        stage3 = jax.jit(_grouped_scores_q)
        sc = stage3(lists, gq, step_list, list_valid, linv, gqinv)
        dt3 = timeit(lambda: stage3(lists, gq, step_list, list_valid, linv,
                                    gqinv))
    else:
        stage3 = jax.jit(_grouped_scores)
        sc = stage3(lists, gq, step_list, list_valid)
        dt3 = timeit(lambda: stage3(lists, gq, step_list, list_valid))
    print(f"stage3 kernel (S,G,P)={tuple(sc.shape)}: {dt3*1e3:.2f} ms",
          flush=True)

    # ---- stage 4: selection + top-k (scores arrive masked+scaled)
    @functools.partial(jax.jit, static_argnames=("kk",))
    def stage4(sc, probe, pair_step, pair_slot, kk):
        scores = sc[pair_step, pair_slot].reshape(b, nprobe * p)
        vals, pos = jax.lax.top_k(scores, kk)
        win_list = jnp.take_along_axis(probe, pos // p, axis=-1)
        ids = list_ids[win_list, pos % p]
        return vals, ids

    vals, ids = stage4(sc, probe, pair_step, pair_slot, args.kwide)
    dt4 = timeit(lambda: stage4(sc, probe, pair_step, pair_slot,
                                args.kwide))
    print(f"stage4 select+topk(width {nprobe*p}, k {args.kwide}): "
          f"{dt4*1e3:.2f} ms", flush=True)

    # ---- stage 5: exact rescore
    dt5 = timeit(lambda: _exact_rescore(buf, inv, q, vals, ids, 10))
    print(f"stage5 rescore (K'={args.kwide}): {dt5*1e3:.2f} ms", flush=True)

    tot = dt1 + dt2 + dt3 + dt4 + dt5
    print(f"sum {tot*1e3:.2f} ms -> {b/tot:.0f} QPS (staged; fused will "
          f"differ)", flush=True)

    # ---- fused reference: the production path on the same tables
    from minivectordb_tpu.ops.pallas_ivf import pallas_ivf_search_grouped

    fused = lambda: _exact_rescore(
        buf, inv, q,
        *pallas_ivf_search_grouped(
            cent, lists, list_ids, list_valid, q, nprobe, args.kwide, g,
            list_inv=linv),
        10)
    dtf = timeit(fused)
    print(f"fused pipeline: {dtf*1e3:.2f} ms -> {b/dtf:.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
