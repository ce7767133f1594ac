"""HF checkpoint -> JAX params conversion (XLM-RoBERTa family).

Replaces the reference's runtime dependency on torch/transformers model
*execution* (reference embedding_model.py:57-60): weights are converted once
into the functional JAX encoder's pytree; all inference runs on TPU.
"""

from __future__ import annotations

import numpy as np

from minivectordb_tpu.models.encoder import EncoderConfig


def config_from_hf(hf_config) -> EncoderConfig:
    return EncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden=hf_config.hidden_size,
        layers=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        intermediate=hf_config.intermediate_size,
        max_positions=hf_config.max_position_embeddings,
        pad_id=getattr(hf_config, "pad_token_id", 1) or 1,
        layer_norm_eps=hf_config.layer_norm_eps,
    )


def params_from_state_dict(sd: dict, cfg: EncoderConfig) -> dict:
    """Map an XLM-RobertaModel/BertModel-style state dict to our pytree.

    torch Linear stores (out, in); our dense is x @ w so weights transpose.
    """
    def t(name):
        w = sd[name]
        arr = w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
        return np.asarray(arr, dtype=np.float32)

    def dense(prefix):
        return {"w": t(f"{prefix}.weight").T, "b": t(f"{prefix}.bias")}

    def ln(prefix):
        return {"g": t(f"{prefix}.weight"), "b": t(f"{prefix}.bias")}

    prefix = ""
    if any(k.startswith("roberta.") for k in sd):
        prefix = "roberta."

    params = {
        "word_emb": t(f"{prefix}embeddings.word_embeddings.weight"),
        "pos_emb": t(f"{prefix}embeddings.position_embeddings.weight"),
        "type_emb": t(f"{prefix}embeddings.token_type_embeddings.weight"),
        "emb_ln": ln(f"{prefix}embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.layers):
        lp = f"{prefix}encoder.layer.{i}"
        params["layers"].append(
            {
                "q": dense(f"{lp}.attention.self.query"),
                "k": dense(f"{lp}.attention.self.key"),
                "v": dense(f"{lp}.attention.self.value"),
                "attn_out": dense(f"{lp}.attention.output.dense"),
                "attn_ln": ln(f"{lp}.attention.output.LayerNorm"),
                "ffn_in": dense(f"{lp}.intermediate.dense"),
                "ffn_out": dense(f"{lp}.output.dense"),
                "ffn_ln": ln(f"{lp}.output.LayerNorm"),
            }
        )
    return params


def load_pretrained(name_or_path: str):
    """Load converted weights (the .npz artifact written by
    ``python -m minivectordb_tpu.models.fetch_weights``) or an HF checkpoint
    (cache/local only — no network) and convert.

    Returns (params, cfg) or raises if unavailable.
    """
    import os

    if os.path.isdir(name_or_path) and os.path.exists(
        os.path.join(name_or_path, "params.npz")
    ):
        return load_converted(name_or_path)
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(name_or_path, local_files_only=True)
    model = AutoModel.from_pretrained(name_or_path, local_files_only=True)
    cfg = config_from_hf(hf_cfg)
    params = params_from_state_dict(model.state_dict(), cfg)
    return params, cfg


# -- converted-artifact format (params.npz + config.json) --------------------
#
# The reference ships its default model as package data
# (reference setup.py:45-47); pretrained transformer weights are too large
# to vendor in a wheel, so the packaging story here is a one-command fetch
# that produces a self-contained directory MINIVECTORDB_TPU_WEIGHTS points at.


def _flatten_params(params: dict) -> dict:
    flat = {}
    for k, v in params.items():
        if k == "layers":
            for i, layer in enumerate(v):
                for lk, lv in layer.items():
                    for pk, pv in lv.items():
                        flat[f"layers.{i}.{lk}.{pk}"] = pv
        elif isinstance(v, dict):
            for pk, pv in v.items():
                flat[f"{k}.{pk}"] = pv
        else:
            flat[k] = v
    return flat


def _unflatten_params(flat: dict, n_layers: int) -> dict:
    params: dict = {"layers": [dict() for _ in range(n_layers)]}
    for k, v in flat.items():
        parts = k.split(".")
        if parts[0] == "layers":
            i, lk, pk = int(parts[1]), parts[2], parts[3]
            params["layers"][i].setdefault(lk, {})[pk] = v
        elif len(parts) == 2:
            params.setdefault(parts[0], {})[parts[1]] = v
        else:
            params[k] = v
    return params


def save_converted(params: dict, cfg: EncoderConfig, out_dir: str) -> None:
    import dataclasses
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "params.npz"), **_flatten_params(params))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_converted(artifact_dir: str):
    import json
    import os

    with open(os.path.join(artifact_dir, "config.json")) as f:
        cfg = EncoderConfig(**json.load(f))
    with np.load(os.path.join(artifact_dir, "params.npz")) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten_params(flat, cfg.layers), cfg
