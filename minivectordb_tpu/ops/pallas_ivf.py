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


# ---------------------------------------------------------------------------
# Batch-first GROUPED probe (round-3, VERDICT #1).
#
# The per-(query, probe) grid above issues B * nprobe tiny (1, d) @ (d, P)
# matmuls and re-DMAs a list block once PER QUERY probing it — dispatch- and
# latency-bound (measured ~290 QPS at 1M x 1024, flat across nprobe). The
# batch-first layout inverts the loop: sort the (query, list) pairs by list
# ON DEVICE, pack each list's queries into G-wide groups, and give the kernel
# a grid over GROUPS — each step DMAs one list block ONCE and scores all G of
# its queries in a single (G, d) @ (d, P) MXU matmul. Per-batch HBM traffic
# collapses from B*nprobe block reads to ~(#touched lists) block reads, which
# at large batch approaches ONE corpus sweep regardless of batch size — while
# compute stays the true sparse B*nprobe*P*d, ~B_eff/B cheaper than exact.
#
# All bookkeeping (sort, ranks, group ids, inverse pair->slot map) runs in
# XLA on device: no host round-trip sits on the hot path.
# ---------------------------------------------------------------------------


def _group_kernel(step_list_ref, gq_ref, lists_ref, valid_ref, out_ref):
    s = pl.program_id(0)

    # padding steps carry list id -1 (the static group-count bound over-
    # provisions by up to ~m/g): their index_map clamps to 0 and repeats, so
    # the pipeline skips the re-fetch, and @pl.when skips the matmul — a
    # padded step costs a few cycles instead of a full MXU weight load
    @pl.when(step_list_ref[s] >= 0)
    def _():
        block = lists_ref[0]  # (P, d) — DMA'd per step_list[s]
        gq = gq_ref[0]  # (G, d) — this step's query group
        if block.dtype == jnp.int8:
            # int8 x int8 -> i32 on the MXU (4x the f32 arithmetic rate,
            # quarter HBM); cosine scales apply in XLA afterwards on the
            # selected (B, nprobe, P) view (selection gathers them anyway)
            dots = jax.lax.dot_general(
                gq,
                block,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            dots = jax.lax.dot_general(
                gq,
                block,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, P)
        # sentinel-mask empty/tombstoned slots HERE, against the (1, P)
        # validity row DMA'd with the block (4 KB/step): the XLA
        # formulation gathered list_valid[probe] into a (B, nprobe, P)
        # tensor and ran a batch-wide where over the scores — two full
        # passes over selection-sized buffers that this elementwise
        # select replaces for free inside the kernel's epilogue.
        # valid_ref[0] is (1, P) — the table ships as (L, 1, P) because
        # Mosaic requires block last-two-dims (1, P) to match the array's
        out_ref[0] = jnp.where(valid_ref[0] != 0, dots, _MASKED_SCORE)


def _group_kernel_q(step_list_ref, gq_ref, qinv_ref, lists_ref, valid_ref,
                    linv_ref, out_ref):
    """int8 variant: the full cosine reconstruction happens in the kernel
    epilogue — raw i32 dots * per-slot list scale (1/||slot||, 0 on empty
    slots) * per-query scale (1/||int8 query||), then the validity mask.
    Doing this in XLA instead required gathering list_inv[probe] into a
    (B, nprobe, P) f32 tensor and two batch-wide elementwise passes; here
    the scales arrive as a (1, P) row + a (1, G) column per step (~4 KB)
    and the epilogue fuses into the matmul's output write. Masking must
    follow scaling: empty slots carry list_inv == 0, and sentinel * 0
    would otherwise turn -3e38 into a clean 0.0 score."""
    s = pl.program_id(0)

    @pl.when(step_list_ref[s] >= 0)
    def _():
        block = lists_ref[0]  # (P, d) int8 — DMA'd per step_list[s]
        gq = gq_ref[0]  # (G, d) int8 — this step's query group
        dots = jax.lax.dot_general(
            gq,
            block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (G, P)
        # linv_ref[0] is (1, P), qinv_ref[0] is (G, 1) — both broadcast
        # against the (G, P) dots (tables ship 3-D for Mosaic's block rule)
        scaled = dots * linv_ref[0] * qinv_ref[0]
        out_ref[0] = jnp.where(valid_ref[0] != 0, scaled, _MASKED_SCORE)


def _grouped_scores_q(lists, grouped_q, step_list, list_valid, list_inv,
                      grouped_qinv):
    """int8 grouped probe: lists (L, P, d) int8; grouped_q (S, G, d) int8;
    step_list (S,) int32; list_valid (L, P) bool; list_inv (L, P) f32;
    grouped_qinv (S, G) f32. Returns (S, G, P) f32 COSINE scores with
    invalid slots sentinel-masked."""
    l, p, d = lists.shape
    s, g, _ = grouped_q.shape
    # 3-D layouts so each block's last two dims satisfy Mosaic's rule:
    # tables (L, 1, P) with (1, 1, P) blocks; qinv (S, G, 1) with
    # (1, G, 1) blocks (G = 16 is divisible by 8)
    valid_i8 = list_valid.astype(jnp.int8).reshape(l, 1, p)
    linv3 = list_inv.reshape(l, 1, p)
    qinv3 = grouped_qinv.reshape(s, g, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda ss, ids: (ss, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, 1), lambda ss, ids: (ss, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, d),
                         lambda ss, ids: (jnp.maximum(ids[ss], 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p),
                         lambda ss, ids: (jnp.maximum(ids[ss], 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p),
                         lambda ss, ids: (jnp.maximum(ids[ss], 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, p), lambda ss, ids: (ss, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _group_kernel_q,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, g, p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * g * p * d + 3 * s * g * p,
            bytes_accessed=s * (p * d + g * d) + 4 * s * g * p
            + 5 * s * p + 4 * s * g,
            transcendentals=0,
        ),
        interpret=interpret,
    )(step_list, grouped_q, qinv3, lists, valid_i8, linv3)


def _grouped_scores(lists, grouped_q, step_list, list_valid):
    """lists (L, P, d); grouped_q (S, G, d) same dtype; step_list (S,) int32
    (-1 marks padding steps); list_valid (L, P) bool/int8. Returns
    (S, G, P) f32 scores with invalid slots already sentinel-masked."""
    l, p, d = lists.shape
    s, g, _ = grouped_q.shape
    # Mosaic VMEM blocks want byte-addressable lanes: ship validity as int8,
    # shaped (L, 1, P) so the (1, 1, P) block's last two dims match the
    # array's (Mosaic's block-shape divisibility rule)
    valid_i8 = list_valid.astype(jnp.int8).reshape(l, 1, p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda ss, ids: (ss, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, d),
                         lambda ss, ids: (jnp.maximum(ids[ss], 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p),
                         lambda ss, ids: (jnp.maximum(ids[ss], 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, p), lambda ss, ids: (ss, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _group_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, g, p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * g * p * d,
            bytes_accessed=s * (p * d + g * d) * lists.dtype.itemsize
            + 4 * s * g * p + s * p,
            transcendentals=0,
        ),
        interpret=interpret,
    )(step_list, grouped_q, lists, valid_i8)


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return jnp.concatenate([jnp.zeros((1,), x.dtype), c[:-1]])


@functools.partial(
    jax.jit, static_argnames=("nprobe", "k", "group", "selector")
)
def pallas_ivf_search_grouped(centroids, lists, list_ids, list_valid, q,
                              nprobe, k, group=16, list_inv=None,
                              selector="exact"):
    """Batch-first grouped IVF probe. Same contract as pallas_ivf_search.

    list_inv (L, P) f32 is required when lists are int8: the kernel emits
    raw i32 dots (cast f32) and the cosine is reconstructed afterwards as
    dot * list_inv[slot] * (1/||int8 query||).

    selector='approx' swaps the final (B, nprobe*P) lax.top_k for TPU
    ApproxTopK — only meaningful when the caller rescores the candidates
    exactly afterwards (two-stage search): the rescore re-sorts, so only
    SET membership matters, and ApproxTopK's recall_target bounds the
    probability of dropping a true candidate."""
    l, p, d = lists.shape
    b = q.shape[0]
    g = int(min(group, max(8, b * nprobe)))
    qn = q.astype(jnp.float32)
    qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-30)
    cscores = jnp.dot(qn, centroids.T, preferred_element_type=jnp.float32)
    if (
        selector == "approx"
        and nprobe < l
        and jax.default_backend() != "cpu"
    ):
        # two-stage callers (selector='approx' == exact rescore downstream)
        # only need the probed LIST SET, not its order: TPU ApproxTopK at a
        # 0.999 per-element recall target replaces the full sort-based
        # lax.top_k over nlist_eff (measured 3.6 ms -> sub-ms at b1024 x
        # 6618 lists; expected probe-set loss 0.1% of one list, noise next
        # to the nprobe recall knob itself)
        _, probe = jax.lax.approx_max_k(cscores, nprobe, recall_target=0.999)
    else:
        _, probe = jax.lax.top_k(cscores, nprobe)  # (B, nprobe)
    probe = probe.astype(jnp.int32)
    if lists.dtype == jnp.int8:
        qi = jnp.clip(jnp.round(qn * 127.0), -127, 127)
        qinv = 1.0 / jnp.maximum(jnp.sqrt(jnp.sum(qi * qi, axis=-1)), 1e-30)
        qd = qi.astype(jnp.int8)
    else:
        qinv = None
        qd = qn.astype(lists.dtype)

    # -- device-side grouping bookkeeping (static shapes throughout) --------
    m = b * nprobe
    l_flat = probe.reshape(-1)
    q_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (b, nprobe), 0).reshape(-1)
    )
    order = jnp.argsort(l_flat)  # pairs sorted by list id
    ls = l_flat[order]
    qs = q_flat[order]
    counts = jax.ops.segment_sum(
        jnp.ones((m,), jnp.int32), ls, num_segments=l
    )
    starts = _exclusive_cumsum(counts)
    rank = jnp.arange(m, dtype=jnp.int32) - starts[ls]
    g_in_list = rank // g
    slot = rank % g
    gbase = _exclusive_cumsum((counts + g - 1) // g)
    gid = gbase[ls] + g_in_list  # group id per sorted pair
    # static step bound: every touched list contributes <=1 partial group,
    # full groups are bounded by m // g
    n_steps = int(min(l, m) + m // g)
    step_list = jnp.full((n_steps,), -1, jnp.int32).at[gid].set(ls)
    step_q = jnp.zeros((n_steps, g), jnp.int32).at[gid, slot].set(qs)
    # inverse map: pair (b, i) -> (its group, its slot) for selection later
    inv_gid = jnp.zeros((m,), jnp.int32).at[order].set(gid)
    inv_slot = jnp.zeros((m,), jnp.int32).at[order].set(slot)
    pair_step = inv_gid.reshape(b, nprobe)
    pair_slot = inv_slot.reshape(b, nprobe)

    grouped_q = qd[step_q]  # (S, G, d); pad slots repeat query 0 (discarded)
    if qinv is not None:
        # int8: cosine scales + validity mask apply in the kernel epilogue
        # (see _group_kernel_q) — no (B, nprobe, P) list_inv/valid gathers
        step_scores = _grouped_scores_q(
            lists, grouped_q, step_list, list_valid, list_inv, qinv[step_q]
        )  # (S, G, P), already cosine + masked
    else:
        step_scores = _grouped_scores(
            lists, grouped_q, step_list, list_valid
        )  # (S, G, P), already masked

    # -- per-query selection --------------------------------------------
    # The kernel emits final masked scores, so selection is ONE gather
    # into (B, nprobe, P) layout + the top-k; winning global ids resolve
    # from pos afterwards with (B, kk)-sized gathers. The previous XLA
    # formulation materialized list_valid[probe] / list_ids[probe]
    # (B, nprobe, P) tensors (~150 MB/batch at the 1M x 1024 point) plus a
    # batch-wide where — all replaced by the kernel epilogue + this slice.
    svals = step_scores[pair_step, pair_slot]  # (B, nprobe, P)
    scores = svals.reshape(b, nprobe * p)
    kk = min(k, nprobe * p)
    if selector == "approx" and kk < nprobe * p and \
            jax.default_backend() != "cpu":
        vals, pos = jax.lax.approx_max_k(scores, kk, recall_target=0.99)
        pos = pos.astype(jnp.int32)
    else:
        vals, pos = jax.lax.top_k(scores, kk)
    win_list = jnp.take_along_axis(probe, pos // p, axis=-1)  # (B, kk)
    ids = list_ids[win_list, pos % p]  # (B, kk) gather — not (B, nprobe*P)
    return vals, ids


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
