"""Weight-conversion fidelity: a randomly-initialized HF XLM-RoBERTa model
(constructed locally — no network) converted to our functional encoder must
reproduce torch's last_hidden_state and the pooled embedding numerically.
This is the parity gate for the real e5/bge-m3 checkpoints (SURVEY.md hard
part (e))."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_hf_model():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = XLMRobertaConfig(
        vocab_size=200,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=66,
        pad_token_id=1,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(cfg, add_pooling_layer=False)
    model.eval()
    return model, cfg


def test_converted_encoder_matches_torch_forward(tiny_hf_model):
    import jax.numpy as jnp

    from minivectordb_tpu.models.convert import config_from_hf, params_from_state_dict
    from minivectordb_tpu.models.encoder import encode, mean_pool_normalize

    model, hf_cfg = tiny_hf_model
    cfg = config_from_hf(hf_cfg)
    params = params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    b, s = 3, 10
    ids = rng.integers(4, 200, (b, s), dtype=np.int64)
    mask = np.ones((b, s), dtype=np.int64)
    mask[1, 7:] = 0  # ragged mask exercises position-id + pooling masking
    ids[1, 7:] = 1  # pad token

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    hidden = np.asarray(
        encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    )
    # only compare non-pad positions (torch computes garbage under pad too,
    # but attention masking means valid positions must agree)
    np.testing.assert_allclose(
        hidden[mask.astype(bool)], out[mask.astype(bool)], rtol=2e-4, atol=2e-5
    )

    # pooled + normalized path matches the reference average_pool+normalize
    # (reference embedding_model.py:50-53,70)
    pooled = np.asarray(
        mean_pool_normalize(jnp.asarray(hidden), jnp.asarray(mask, jnp.int32))
    )
    t_hidden = torch.tensor(out)
    t_mask = torch.tensor(mask)
    masked = t_hidden.masked_fill(~t_mask[..., None].bool(), 0.0)
    t_pooled = masked.sum(dim=1) / t_mask.sum(dim=1)[..., None]
    t_pooled = torch.nn.functional.normalize(t_pooled, p=2, dim=1).numpy()
    np.testing.assert_allclose(pooled, t_pooled, rtol=2e-4, atol=2e-5)


def _full_arch_parity(hf_cfg_kwargs, pooling, seq=16, batch=2):
    """Shared body: construct a randomly-initialized local XLM-R at FULL
    architecture dims (no network), convert, compare vs torch forward."""
    import jax.numpy as jnp

    from transformers import XLMRobertaConfig, XLMRobertaModel

    from minivectordb_tpu.models.convert import (
        config_from_hf,
        params_from_state_dict,
    )
    from minivectordb_tpu.models.encoder import (
        cls_pool_normalize,
        encode,
        mean_pool_normalize,
    )

    cfg_hf = XLMRobertaConfig(**hf_cfg_kwargs)
    torch.manual_seed(1)
    model = XLMRobertaModel(cfg_hf, add_pooling_layer=False)
    model.eval()
    cfg = config_from_hf(cfg_hf)
    params = params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(4, cfg_hf.vocab_size, (batch, seq), dtype=np.int64)
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[1, seq - 4:] = 0
    ids[1, seq - 4:] = cfg_hf.pad_token_id

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    hidden = np.asarray(
        encode(params, cfg, jnp.asarray(ids, jnp.int32),
               jnp.asarray(mask, jnp.int32))
    )
    # 24 layers accumulate rounding; compare with depth-scaled tolerance
    np.testing.assert_allclose(
        hidden[mask.astype(bool)], out[mask.astype(bool)],
        rtol=5e-3, atol=5e-4,
    )
    if pooling == "mean":
        pooled = np.asarray(
            mean_pool_normalize(jnp.asarray(hidden), jnp.asarray(mask, jnp.int32))
        )
        t_hidden = torch.tensor(out)
        t_mask = torch.tensor(mask)
        masked = t_hidden.masked_fill(~t_mask[..., None].bool(), 0.0)
        t_pooled = masked.sum(dim=1) / t_mask.sum(dim=1)[..., None]
        t_pooled = torch.nn.functional.normalize(t_pooled, p=2, dim=1).numpy()
    else:
        pooled = np.asarray(
            cls_pool_normalize(jnp.asarray(hidden), jnp.asarray(mask, jnp.int32))
        )
        t_pooled = torch.nn.functional.normalize(
            torch.tensor(out[:, 0]), p=2, dim=1
        ).numpy()
    np.testing.assert_allclose(pooled, t_pooled, rtol=5e-3, atol=5e-4)
    return params, cfg


def test_full_architecture_e5_large_parity():
    """e5-large architecture exactly (24 layers, 1024 hidden, 16 heads, 4096
    intermediate, 514 positions incl. the XLM-R pos offset), vocab reduced
    to 512 — vocab size only changes the embedding-lookup table dimensions,
    never the compute path the VERDICT flagged as unvalidated (mean pooling,
    reference embedding_model.py:50-53,57-58)."""
    _full_arch_parity(
        dict(
            vocab_size=512,
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            max_position_embeddings=514,
            pad_token_id=1,
            layer_norm_eps=1e-5,
        ),
        pooling="mean",
    )


def test_full_architecture_bgem3_parity_and_artifact_roundtrip(tmp_path):
    """bge-m3 architecture exactly (XLM-R-large backbone with 8194 positions,
    CLS pooling, reference embedding_model.py:59-60,73-79), vocab reduced to
    512; also round-trips the converted params through the fetch_weights
    artifact format (params.npz + config.json)."""
    import jax.numpy as jnp

    params, cfg = _full_arch_parity(
        dict(
            vocab_size=512,
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            max_position_embeddings=8194,
            pad_token_id=1,
            layer_norm_eps=1e-5,
        ),
        pooling="cls",
    )
    from minivectordb_tpu.models.convert import load_converted, save_converted
    from minivectordb_tpu.models.encoder import encode

    save_converted(params, cfg, str(tmp_path / "bgem3"))
    params2, cfg2 = load_converted(str(tmp_path / "bgem3"))
    assert cfg2 == cfg
    ids = jnp.asarray(np.full((1, 8), 5, np.int32))
    mask = jnp.asarray(np.ones((1, 8), np.int32))
    np.testing.assert_array_equal(
        np.asarray(encode(params, cfg, ids, mask)),
        np.asarray(encode(params2, cfg2, ids, mask)),
    )
