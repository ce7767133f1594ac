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
