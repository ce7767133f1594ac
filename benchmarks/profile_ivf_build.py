"""Stage-by-stage timing of IVFIndex.build at the config-5 scale
(1M x 1024, nlist 4096) to locate the remaining build-time cost."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minivectordb_tpu.ops import ivf as ivf_mod
from minivectordb_tpu.ops import scan as scan_ops

N, D, NLIST, ITERS = 1_000_000, 1024, 4096, 10

t0 = time.perf_counter()
buf = jax.random.normal(jax.random.PRNGKey(0), (N, D), dtype=jnp.float32)
inv = scan_ops.row_inv_norms(buf)
np.asarray(inv[:1])
print(f"corpus gen {time.perf_counter()-t0:.1f}s", flush=True)


def stage(name, fn, twice=True):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    if twice:
        t1 = time.perf_counter()
        fn()
        dt2 = time.perf_counter() - t1
        print(f"{name}: {dt:.2f}s first (incl. compile), {dt2:.2f}s warm",
              flush=True)
    else:
        print(f"{name}: {dt:.2f}s", flush=True)
    return out


key = jax.random.PRNGKey(0)
train_cap = max(NLIST * 64, 100_000)
rng = np.random.default_rng(0)
idx = np.sort(rng.choice(N, train_cap, replace=False)).astype(np.int32)
def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf[:1])  # device->host copy: the only reliable sync here
    return x


sample = stage(
    "sample gather",
    lambda: _sync(ivf_mod._gather_normalized_sample(buf, inv, jnp.asarray(idx))),
)
centroids, _a = stage(
    "kmeans (10 iters)",
    lambda: _sync(ivf_mod._kmeans_device(sample, key, NLIST, ITERS)),
)
assign_dev = stage(
    "assign full (device)",
    lambda: _sync(ivf_mod._assign_full_device(buf, centroids, N)),
)
assign = stage("assign -> host", lambda: np.array(assign_dev), twice=False)
centroids_np = np.asarray(centroids)


def skew():
    a = assign.copy()
    counts = np.bincount(a, minlength=NLIST)
    cap = int(max(8, np.ceil(1.5 * N / max(1, NLIST))))
    new_centroids = [centroids_np]
    next_id = NLIST
    for c in np.nonzero(counts > cap)[0]:
        rows = np.nonzero(a == c)[0]
        n_parts = int(np.ceil(len(rows) / cap))
        for p in range(1, n_parts):
            part = rows[p * cap : (p + 1) * cap]
            a[part] = next_id
            next_id += 1
            new_centroids.append(centroids_np[c][None, :])
    print(f"  oversized clusters: {int((counts > cap).sum())}, "
          f"extra lists: {next_id - NLIST}", flush=True)
    return a, next_id


assign2, nlist2 = stage("skew split (host)", skew, twice=False)


def layout():
    a = assign2
    counts = np.bincount(a, minlength=nlist2)
    order = np.argsort(a, kind="stable")
    sorted_assign = a[order]
    pad = int(max(1, counts.max()))
    pad = (pad + 127) // 128 * 128
    starts = np.zeros(nlist2, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    rank = np.arange(len(order), dtype=np.int64) - starts[sorted_assign]
    slot = sorted_assign.astype(np.int64) * pad + rank
    return slot, order, pad


slot, order, pad = stage("layout (host argsort)", layout, twice=False)


def scatter():
    dest = np.empty(N, dtype=np.int32)
    dest[order] = slot.astype(np.int32)
    out = ivf_mod._scatter_lists(
        buf, inv, jnp.asarray(dest), N, nlist2 * pad, jnp.float32
    )
    return _sync(out)


stage("device scatter", scatter)

# end-to-end for reference
ivf = ivf_mod.IVFIndex(nlist=NLIST, nprobe=32, iters=ITERS)
stage("full build()", lambda: ivf.build(buf, count=N, inv_norms=inv), twice=False)
