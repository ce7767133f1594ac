"""Contrastive fine-tuning of the embedding encoder (multi-chip).

The reference has no training at all (SURVEY.md §2c: DP/TP/PP absent — the
repo only serves embeddings). This module is the framework's training
capability: in-batch InfoNCE contrastive loss over (query, passage) pairs —
the objective the e5/bge-m3 family is trained with — as one jitted step over
a 2-D (dp, tp) ``jax.sharding.Mesh``:

- dp: the batch axis is sharded across data-parallel devices; gradients are
  reduced by XLA (GSPMD inserts the psum — no hand-written collectives).
- tp: attention q/k/v and MLP weights are sharded column-/row-wise across
  tensor-parallel devices (Megatron layout), so activations all-reduce over
  ICI inside each layer.

PP/SP/EP are intentionally absent: encoders here are <=24 layers, 512-token
bounded (reference embedding_model.py:64,77), far below the scale where
pipeline or sequence parallelism pays (SURVEY.md §5).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minivectordb_tpu.models.encoder import EncoderConfig, encode, mean_pool_normalize
from minivectordb_tpu.parallel.mesh import DP_AXIS, TP_AXIS


def param_shardings(mesh: Mesh, params) -> dict:
    """Megatron-style TP layout for the encoder pytree.

    q/k/v and ffn_in shard the OUTPUT dim (column parallel); attn_out and
    ffn_out shard the INPUT dim (row parallel); embeddings/layernorms are
    replicated.
    """

    def spec_for(path: tuple[str, ...]):
        if "layers" in path:
            leaf_parent = path[-2]
            leaf = path[-1]
            if leaf == "w":
                if leaf_parent in ("q", "k", "v", "ffn_in"):
                    return P(None, TP_AXIS)
                if leaf_parent in ("attn_out", "ffn_out"):
                    return P(TP_AXIS, None)
            if leaf == "b" and leaf_parent in ("q", "k", "v", "ffn_in"):
                return P(TP_AXIS)
        return P()

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path) for v in node]
        return NamedSharding(mesh, spec_for(path))

    return walk(params, ())


def info_nce_loss(params, cfg: EncoderConfig, batch, temperature: float = 0.05):
    """In-batch InfoNCE: query i must match passage i against all others.

    When the batch carries a soft ``labels`` matrix (B, B), the loss is
    multi-positive cross-entropy: a query whose text mentions several
    in-batch topics targets 1/m mass on EACH topic's passage, so its
    optimal embedding is the passages' barycenter — balanced multi-topic
    composition by construction (the corpus sampler emits these rows,
    models/builtin_data.py)."""
    q_emb = mean_pool_normalize(
        encode(params, cfg, batch["q_ids"], batch["q_mask"]), batch["q_mask"],
        cfg.token_norm_pool,
    )
    p_emb = mean_pool_normalize(
        encode(params, cfg, batch["p_ids"], batch["p_mask"]), batch["p_mask"],
        cfg.token_norm_pool,
    )
    logits = (
        jnp.dot(q_emb, p_emb.T, preferred_element_type=jnp.float32) / temperature
    )
    diag = jnp.arange(logits.shape[0])
    if "labels" in batch:
        loss = optax.softmax_cross_entropy(logits, batch["labels"]).mean()
        # accuracy: argmax must land anywhere in the positive support
        hit = jnp.take_along_axis(
            batch["labels"] > 0, jnp.argmax(logits, axis=-1)[:, None], axis=1
        )[:, 0]
        acc = jnp.mean(hit)
    else:
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, diag
        ).mean()
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == diag)
    return loss, acc


def make_train_step(cfg: EncoderConfig, optimizer, mesh: Mesh | None = None,
                    temperature: float = 0.05):
    """Build the jitted training step. With a mesh, params get TP shardings
    and the batch is dp-sharded; XLA inserts all collectives."""

    def step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: info_nce_loss(p, cfg, batch, temperature), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    row_sharded = NamedSharding(mesh, P(DP_AXIS, None))

    def sharded_step(params, opt_state, batch):
        # every batch tensor (token ids, masks, optional soft labels) is
        # row-sharded over dp
        batch = {
            k: jax.lax.with_sharding_constraint(v, row_sharded)
            for k, v in batch.items()
        }
        return step(params, opt_state, batch)

    return jax.jit(sharded_step, donate_argnums=(0, 1))


def init_training(cfg: EncoderConfig, params, mesh: Mesh | None = None,
                  learning_rate: float = 1e-4):
    """Place params (TP-sharded on a mesh) and build optimizer state."""
    optimizer = optax.adamw(learning_rate)
    if mesh is not None:
        shardings = param_shardings(mesh, params)
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, s), params, shardings,
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )
    opt_state = optimizer.init(params)
    return params, opt_state, optimizer


def train_loop(
    cfg: EncoderConfig,
    params,
    batch_iter,
    steps: int,
    mesh: Mesh | None = None,
    learning_rate: float = 1e-4,
    temperature: float = 0.05,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 100,
    start_step: int = 0,
    opt_state=None,
    log_every: int = 10,
    log_fn=print,
):
    """Simple driver loop: jitted step + periodic atomic checkpointing
    (models/checkpoint.py). `batch_iter` yields dicts with
    q_ids/q_mask/p_ids/p_mask. Returns (params, opt_state, history)."""
    from minivectordb_tpu.models.checkpoint import save_checkpoint

    placed, fresh_opt, optimizer = init_training(
        cfg, params, mesh=mesh, learning_rate=learning_rate
    )
    params = placed
    if opt_state is None:
        opt_state = fresh_opt
    step_fn = make_train_step(cfg, optimizer, mesh=mesh,
                              temperature=temperature)
    history = []
    for step in range(start_step, start_step + steps):
        batch = next(batch_iter)
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if log_every and step % log_every == 0:
            loss = float(metrics["loss"])
            acc = float(metrics["accuracy"])
            history.append({"step": step, "loss": loss, "accuracy": acc})
            log_fn(f"step {step}: loss={loss:.4f} acc={acc:.3f}")
        if checkpoint_path and (step + 1) % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, params, opt_state, step + 1)
    if checkpoint_path:
        save_checkpoint(checkpoint_path, params, opt_state, start_step + steps)
    return params, opt_state, history
