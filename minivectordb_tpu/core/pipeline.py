"""Fused embed->search device pipeline.

The reference embeds and searches in two separate library calls through two
different native stacks (ONNX/torch for the encoder, FAISS for the scan —
embedding_model.py:84-91 then vector_database.py:466). Here both halves are
JAX, so a text query runs as ONE jitted device program: tokenize (host) ->
encoder forward -> masked mean-pool -> L2 normalize -> masked cosine scan ->
top-k. No intermediate host round-trip for the embedding.

This is the "embed+query p50 latency; one fused device program" metric from
BASELINE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from minivectordb_tpu.models.encoder import (
    apply_cos_floor,
    cls_pool_normalize,
    encode,
    mean_pool_normalize,
)
from minivectordb_tpu.ops.scan import (
    _MASKED_SCORE,
    fetch_results as scan_fetch_results,
    topk_last_axis,
)


@functools.partial(jax.jit, static_argnames=("cfg", "pooling", "k", "mode"))
def embed_search_program(
    params, cfg, input_ids, attention_mask, buf, inv_norms, count, k,
    pooling="mean", mask=None, mode="exact",
):
    """Tokens -> embeddings -> top-k over the corpus, one device program."""
    hidden = encode(params, cfg, input_ids, attention_mask)
    if pooling == "cls":
        q = cls_pool_normalize(hidden, attention_mask)
    else:
        q = mean_pool_normalize(hidden, attention_mask, cfg.token_norm_pool)
    q = apply_cos_floor(q, cfg)
    c = buf.shape[0]
    scores = jax.lax.dot_general(
        q.astype(buf.dtype),
        buf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if buf.dtype == jnp.float32 else None,
    )
    scores = scores * inv_norms[None, :]
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1) < count
    if mask is not None:
        valid = jnp.logical_and(valid, mask[None, :])
    scores = jnp.where(valid, scores, _MASKED_SCORE)
    vals, idx = topk_last_axis(scores, k, mode)
    return q, vals, idx.astype(jnp.int32)


class TextSearchPipeline:
    """Binds an EmbeddingModel and a database engine into fused text search.

    Usage:
        pipe = TextSearchPipeline(model, db)
        ids, scores, metas = pipe.search("query text", k=5)
    """

    def __init__(self, model, db):
        self.model = model
        self.db = db

    def search(self, texts, k: int = 5, metadata_filter=None,
               exclude_filter=None, or_filters=None):
        """texts: str or list[str]. Returns one (ids, scores, metadatas)
        triple for a single text, or a list of triples for a batch."""
        single = isinstance(texts, str)
        if single:
            texts = [texts]
        eng = self.db._engine
        if eng.store is None or eng.count == 0:
            out = [([], [], [])] * len(texts)
            return out[0] if single else out

        enc = self.model.model  # _JaxEncoder

        # IVF databases route through the engine's own search core: the
        # coarse probe beats the fused exact scan by ~5x at corpus scale,
        # and the embedding hand-off is a (B, d) host array — trivial next
        # to the scan it avoids. The engine handles filters (broad filters
        # ride the probe, selective go exact), the overflow merge and the
        # count-guarantee fallback; fusion only ever paid for skipping that
        # hand-off, which stops mattering the moment the scan is probed.
        if eng.ivf_active():
            q = enc.embed(texts)
            res = eng.search_batch(
                q, metadata_filter, exclude_filter, or_filters, k
            )
            return res[0] if single else res

        # Under the lock: filter + device-cache sync + row-aligned snapshots.
        # The fused tokenize->embed->scan program itself runs OUTSIDE the lock
        # (the device inputs are immutable), so concurrent writers are never
        # blocked behind an encoder forward pass.
        with eng.lock:
            mask, n_candidates = eng._candidate_mask(
                metadata_filter, exclude_filter, or_filters
            )
            if n_candidates == 0:
                out = [([], [], [])] * len(texts)
                return out[0] if single else out
            search_k = min(k, n_candidates)
            snap = eng.store.snapshot()
            uids, metadata = eng.uids, eng.metadata
            mask_thunk = (
                None if mask is None
                else eng._device_mask_thunk(
                    metadata_filter, exclude_filter, or_filters, mask
                )
            )

        # Tiny-corpus shortcut: below the store's always-host byte bound a
        # host scan beats any device dispatch, so pay neither the fused
        # program's compile nor its round-trip — embed through the encoder's
        # own adaptive host/device router, scan on the host. 'mixed' is
        # f32-authoritative after rescore, so host-exact is identical there.
        from minivectordb_tpu.core.store import _HOST_ALWAYS_BYTES

        if (
            eng.search_mode in ("exact", "mixed")
            and snap._host_eligible("exact", len(texts))
            and snap.count * snap.dim_bytes <= _HOST_ALWAYS_BYTES
        ):
            # embed() tokenizes internally — tokenization is deliberately
            # deferred until after this routing decision so neither branch
            # pays it twice
            q = enc.embed(texts)
            vals, idx = snap._host_search(q, search_k, mask)
        else:
            batch = enc.tokenizer(
                [enc.prefix + t for t in texts], max_length=512
            )
            ids_arr = np.asarray(batch["input_ids"], dtype=np.int32)
            mask_arr = np.asarray(batch["attention_mask"], dtype=np.int32)
            from minivectordb_tpu.models.encoder import seq_bucket

            s = seq_bucket(ids_arr.shape[1], 512)
            if ids_arr.shape[1] < s:
                pad = s - ids_arr.shape[1]
                ids_arr = np.pad(ids_arr, ((0, 0), (0, pad)),
                                 constant_values=enc.cfg.pad_id)
                mask_arr = np.pad(mask_arr, ((0, 0), (0, pad)))
            row_mask = None
            if mask is not None:
                if mask_thunk is not None:
                    row_mask = mask_thunk(snap.buf.shape[0])
                else:
                    padded = np.zeros(snap.buf.shape[0], dtype=bool)
                    padded[: mask.shape[0]] = mask
                    row_mask = jnp.asarray(padded)
            from minivectordb_tpu.ops.scan import k_bucket

            kb = k_bucket(search_k, snap.buf.shape[0])
            _, vals, idx = embed_search_program(
                enc.params, enc.cfg,
                jnp.asarray(ids_arr), jnp.asarray(mask_arr),
                snap.buf, snap.inv_norms, snap.count, kb,
                enc.pooling, row_mask, eng.search_mode,
            )
            vals, idx = scan_fetch_results(
                vals[:, :search_k], idx[:, :search_k]
            )
        vals = vals[:, :search_k]
        idx = idx[:, :search_k]

        results = []
        for b in range(len(texts)):
            found = [
                (uids[row], np.float32(score), metadata[row])
                for score, row in zip(vals[b], idx[b])
                if score >= -1.0e38
            ]
            results.append(tuple(zip(*found)) if found else ([], [], []))
        return results[0] if single else results
