"""Functional JAX transformer encoder (XLM-RoBERTa family).

TPU-native replacement for the reference's three embedding backends
(reference embedding_model.py:37-79): onnxruntime USE-multilingual, torch
``intfloat/multilingual-e5-{small,large}`` and FlagEmbedding ``BAAI/bge-m3``
are all XLM-R-architecture encoders (or, for USE, an encoder with the same
pool-and-normalize contract), so ONE functional implementation covers every
model family; per-family weights are converted from HF checkpoints
(models/convert.py) or deterministically initialized as a fallback.

Design: pure functions over a params pytree, jitted per (batch, seq) bucket;
bfloat16 matmuls on the MXU with float32 layernorm/softmax accumulation.
Masked mean-pool + L2-normalize fuse into the same program
(reference embedding_model.py:50-53, 67-70).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int
    hidden: int
    layers: int
    heads: int
    intermediate: int
    max_positions: int = 514
    pad_id: int = 1
    layer_norm_eps: float = 1e-5
    # XLM-R position ids start at pad_id + 1 for real tokens
    pos_offset: int = 2
    # L2-normalize each token's hidden state BEFORE mean pooling, so every
    # token contributes exactly 1/n to the sentence vector. Used by the
    # bundled trained builtin encoder: with raw mean pooling the effective
    # per-token weight varies with hidden-state norm/attention, so a
    # multi-topic query weights its topics unevenly (which breaks the
    # reference's distance-ratio autocut parity on the usearch engine).
    token_norm_pool: bool = False
    # When > 0, the LAST output dim is replaced by the constant sqrt(f) and
    # the rest rescaled by sqrt(1-f), so every pairwise cosine becomes
    # (1-f)*cos + f >= 2f-1 exactly. Used by the bundled trained builtin
    # encoder to reproduce the high-anisotropy score distribution of real
    # sentence encoders (the reference's autocut contract — a >20% RELATIVE
    # score drop, reference vector_database.py:443-464 — presumes cosines
    # well above zero, as its ONNX USE model produces).
    cos_floor: float = 0.0


def init_params(cfg: EncoderConfig, seed: int, dtype=jnp.float32) -> dict:
    """Deterministic (seeded) initialization — the no-pretrained fallback."""
    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 8 + 16 * cfg.layers))

    def dense(kin, kout):
        k = next(keys)
        scale = 1.0 / np.sqrt(kin)
        return {
            "w": jax.random.normal(k, (kin, kout), dtype) * scale,
            "b": jnp.zeros((kout,), dtype),
        }

    def ln():
        return {"g": jnp.ones((cfg.hidden,), dtype), "b": jnp.zeros((cfg.hidden,), dtype)}

    params = {
        "word_emb": jax.random.normal(next(keys), (cfg.vocab_size, cfg.hidden), dtype)
        * 0.02,
        "pos_emb": jax.random.normal(
            next(keys), (cfg.max_positions, cfg.hidden), dtype
        )
        * 0.02,
        "type_emb": jnp.zeros((1, cfg.hidden), dtype),
        "emb_ln": ln(),
        "layers": [],
    }
    for _ in range(cfg.layers):
        params["layers"].append(
            {
                "q": dense(cfg.hidden, cfg.hidden),
                "k": dense(cfg.hidden, cfg.hidden),
                "v": dense(cfg.hidden, cfg.hidden),
                "attn_out": dense(cfg.hidden, cfg.hidden),
                "attn_ln": ln(),
                "ffn_in": dense(cfg.hidden, cfg.intermediate),
                "ffn_out": dense(cfg.intermediate, cfg.hidden),
                "ffn_ln": ln(),
            }
        )
    return params


def _layer_norm(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _dense(x, p):
    return (
        jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        + p["b"]
    ).astype(x.dtype)


def _use_flash_attention(seq: int, head_dim: int) -> bool:
    """Use the official Pallas flash-attention kernel on TPU for long
    sequences (O(seq) memory, fused softmax); einsum attention elsewhere
    (CPU backend, short sequences where kernel launch overhead dominates)."""
    return (
        jax.default_backend() != "cpu"
        and seq >= 256
        and seq % 128 == 0
        and head_dim >= 32
    )


def _attention(x, layer, mask, cfg: EncoderConfig, allow_flash: bool = True):
    b, s, h = x.shape
    nh, hd = cfg.heads, cfg.hidden // cfg.heads
    q = _dense(x, layer["q"]).reshape(b, s, nh, hd)
    k = _dense(x, layer["k"]).reshape(b, s, nh, hd)
    v = _dense(x, layer["v"]).reshape(b, s, nh, hd)
    if allow_flash and _use_flash_attention(s, hd):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds,
            flash_attention,
        )

        seg = mask.astype(jnp.int32)  # pads form their own segment (0)
        ctx = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=float(1.0 / np.sqrt(hd)),
        ).transpose(0, 2, 1, 3)
        ctx = ctx.astype(x.dtype).reshape(b, s, h)
        return _dense(ctx, layer["attn_out"])
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / np.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask[:, None, None, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).reshape(b, s, h)
    return _dense(ctx, layer["attn_out"])


def encode(params, cfg: EncoderConfig, input_ids, attention_mask,
           allow_flash: bool = True):
    """Forward pass -> last_hidden_state (B, S, H).

    input_ids/attention_mask: (B, S) int32. Post-LN transformer matching
    XLM-RoBERTa; position ids follow the XLM-R convention
    (pad positions get pad_id, real tokens count from pad_id + 1).

    allow_flash=False forces einsum attention regardless of the default
    backend — required when the program is compiled for the HOST (cpu)
    backend while the process default is TPU: _use_flash_attention reads
    the global default backend at trace time, which would wrongly pick the
    TPU-only Pallas kernel inside a cpu-backend jit.
    """
    mask = attention_mask.astype(bool)
    positions = jnp.cumsum(attention_mask, axis=-1) * attention_mask + cfg.pad_id
    x = (
        params["word_emb"][input_ids]
        + params["pos_emb"][positions]
        + params["type_emb"][jnp.zeros_like(input_ids)]
    )
    x = _layer_norm(x, params["emb_ln"]["g"], params["emb_ln"]["b"], cfg.layer_norm_eps)
    for layer in params["layers"]:
        attn = _attention(x, layer, mask, cfg, allow_flash)
        x = _layer_norm(
            x + attn, layer["attn_ln"]["g"], layer["attn_ln"]["b"], cfg.layer_norm_eps
        )
        ff = _dense(jax.nn.gelu(_dense(x, layer["ffn_in"]), approximate=False), layer["ffn_out"])
        x = _layer_norm(
            x + ff, layer["ffn_ln"]["g"], layer["ffn_ln"]["b"], cfg.layer_norm_eps
        )
    return x


def mean_pool_normalize(hidden, attention_mask, token_norm: bool = False):
    """Masked mean-pool + L2 normalize (reference embedding_model.py:50-53,70).
    Accumulates in float32 regardless of the encoder compute dtype.
    token_norm: see EncoderConfig.token_norm_pool."""
    hidden = hidden.astype(jnp.float32)
    if token_norm:
        hidden = hidden / jnp.maximum(
            jnp.linalg.norm(hidden, axis=-1, keepdims=True), 1e-12
        )
    m = attention_mask[..., None].astype(jnp.float32)
    summed = jnp.sum(hidden * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    pooled = summed / counts
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )


def cls_pool_normalize(hidden, attention_mask):
    """CLS-token pooling + L2 normalize (bge-m3 dense vectors use CLS;
    FlagEmbedding BGEM3 'dense_vecs' come from the CLS hidden state)."""
    del attention_mask
    pooled = hidden[:, 0, :].astype(jnp.float32)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )


def apply_cos_floor(out, cfg: EncoderConfig):
    """Apply cfg.cos_floor to unit embeddings (see EncoderConfig.cos_floor);
    identity when the floor is 0. Must be applied by EVERY path that emits
    this encoder's embeddings (embed_program AND the fused pipeline)."""
    if cfg.cos_floor <= 0.0:
        return out
    f = cfg.cos_floor
    body = out[:, :-1]
    body = body / jnp.maximum(
        jnp.linalg.norm(body, axis=-1, keepdims=True), 1e-12
    )
    return jnp.concatenate(
        [
            body * np.sqrt(1.0 - f),
            jnp.full((out.shape[0], 1), np.sqrt(f), out.dtype),
        ],
        axis=-1,
    )


def _embed_impl(params, cfg: EncoderConfig, input_ids, attention_mask,
                pooling, allow_flash):
    hidden = encode(params, cfg, input_ids, attention_mask, allow_flash)
    if pooling == "cls":
        out = cls_pool_normalize(hidden, attention_mask)
    else:
        out = mean_pool_normalize(hidden, attention_mask, cfg.token_norm_pool)
    return apply_cos_floor(out, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "pooling"))
def embed_program(params, cfg: EncoderConfig, input_ids, attention_mask, pooling="mean"):
    """The fused embed program: encoder forward + pool + normalize."""
    return _embed_impl(params, cfg, input_ids, attention_mask, pooling, True)


@functools.partial(jax.jit, static_argnames=("cfg", "pooling"))
def _embed_program_noflash(params, cfg: EncoderConfig, input_ids,
                           attention_mask, pooling="mean"):
    return _embed_impl(params, cfg, input_ids, attention_mask, pooling, False)


def embed_program_host(params, cfg: EncoderConfig, input_ids, attention_mask,
                       pooling="mean"):
    """The same embed program compiled for and run on the HOST (cpu) backend.

    Single-text embeds through a remote TPU link pay a fixed dispatch/RTT
    cost that dwarfs the compute for the compact bundled encoders (2 layers,
    hidden <= 1024: well under a millisecond of host sgemm). An adaptive
    router in _JaxEncoder (embedding_model.py) picks this path for small
    batches the same way the store routes small-corpus scans to host BLAS.

    Placement is via committed cpu inputs (jit's ``backend=`` is
    deprecated): params must already live on a cpu device
    (_JaxEncoder._host_params_synced does this); ids/mask are committed
    here. Flash attention is disabled: the Pallas kernel is TPU-only and
    _use_flash_attention reads the process-default backend, not the
    device the program actually compiles for."""
    cpu = jax.local_devices(backend="cpu")[0]
    # device_put straight from host memory — jnp.asarray first would bounce
    # the tokens through the (possibly remote) default device
    input_ids = jax.device_put(np.asarray(input_ids), cpu)
    attention_mask = jax.device_put(np.asarray(attention_mask), cpu)
    return _embed_program_noflash(params, cfg, input_ids, attention_mask,
                                  pooling)


def seq_bucket(n: int, max_len: int = 512) -> int:
    b = 16
    while b < n and b < max_len:
        b <<= 1
    return min(b, max_len)
