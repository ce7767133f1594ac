"""Pallas IVF probe kernel (scalar-prefetch paged lookup).

The XLA formulations of the IVF probe are either a giant gather (slow
scatter/gather pass) or a lax.map of tiny dynamic-slice matvecs
(scheduling-bound: measured ~3.8 ms/query for ~6 MB of probed data at
1M x 1024). The TPU-native shape of this problem is the PAGED pattern used
by paged attention: the probe ids are scalar-prefetched, the BlockSpec
index_map reads them to drive the grid's block DMAs, and the Pallas pipeline
double-buffers list blocks from HBM while the MXU scores the previous one.

Kernel layout:
  grid = (B, nprobe); step (b, i) DMAs list block ids[b, i] -> VMEM and
  scores it against query b. Queries and the (B, nprobe*P) score output stay
  whole in VMEM across steps. Masking/top-k run in XLA afterwards (tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASKED_SCORE = np.float32(-3.0e38)

# queries per kernel call: bounds the whole-in-VMEM output buffer
_QUERY_CHUNK = 64


def _probe_kernel(ids_ref, q_ref, lists_ref, out_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    del ids_ref  # consumed by the index_map (scalar prefetch)
    block = lists_ref[0]  # (P, d), DMA'd according to ids[b, i]
    # select query row b without a dynamic VMEM load: one-hot contraction
    q = q_ref[:]  # (B, d)
    rows = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 1), 0)
    qv = jnp.sum(jnp.where(rows == b, q, 0.0), axis=0, keepdims=True)  # (1, d)
    scores = jax.lax.dot_general(
        qv,
        block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, P)
    p = block.shape[0]
    # P is padded to a multiple of 128 (ivf.py), so the lane offset is
    # provably aligned — Mosaic requires a static multiple-of-128 proof
    off = pl.multiple_of(i * p, 128)
    out_ref[pl.ds(b, 1), pl.ds(off, p)] = scores


def _probe_scores(lists, q, probe_ids):
    """lists (L, P, d); q (B, d) matching lists dtype; probe_ids (B, nprobe)
    int32. Returns (B, nprobe*P) f32 scores (unmasked)."""
    l, p, d = lists.shape
    b, nprobe = probe_ids.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((b, d), lambda bb, ii, ids: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, d), lambda bb, ii, ids: (ids[bb, ii], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nprobe * p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nprobe * p * d,
            bytes_accessed=b * nprobe * p * d * lists.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(probe_ids, q, lists)


@functools.partial(jax.jit, static_argnames=("nprobe", "k"))
def pallas_ivf_search(centroids, lists, list_ids, list_valid, q, nprobe, k):
    """Drop-in for ops/ivf._ivf_search with the paged Pallas probe."""
    l, p, d = lists.shape
    b = q.shape[0]
    qn = q.astype(jnp.float32)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-30)
    cscores = jnp.dot(qn, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cscores, nprobe)  # (B, nprobe)
    probe = probe.astype(jnp.int32)
    qd = qn.astype(lists.dtype)

    def run_chunk(args):
        q_chunk, probe_chunk = args
        return _probe_scores(lists, q_chunk, probe_chunk)

    if b <= _QUERY_CHUNK:
        scores = _probe_scores(lists, qd, probe)
    else:
        pad = (-b) % _QUERY_CHUNK
        qp = jnp.pad(qd, ((0, pad), (0, 0)))
        pp = jnp.pad(probe, ((0, pad), (0, 0)))
        n_chunks = (b + pad) // _QUERY_CHUNK
        scores = jax.lax.map(
            run_chunk,
            (
                qp.reshape(n_chunks, _QUERY_CHUNK, d),
                pp.reshape(n_chunks, _QUERY_CHUNK, nprobe),
            ),
        ).reshape(b + pad, nprobe * p)[:b]

    # mask + global ids in XLA (small tensors)
    valid = list_valid[probe].reshape(b, nprobe * p)  # (B, nprobe*P)
    gids = list_ids[probe].reshape(b, nprobe * p)
    scores = jnp.where(valid, scores, _MASKED_SCORE)
    kk = min(k, nprobe * p)
    vals, pos = jax.lax.top_k(scores, kk)
    ids = jnp.take_along_axis(gids, pos, axis=-1)
    return vals, ids
