"""End-to-end fetch -> convert -> serve, against a REAL HF checkpoint on disk
(round-3, VERDICT #2a: the fetch path had never executed against an actual
transformers checkpoint — only the conversion math had been parity-tested).

A tiny XLMRobertaModel is saved with ``save_pretrained`` (genuine HF
serialization: config.json + safetensors + fast-tokenizer files), then the
UNMODIFIED ``fetch_weights.fetch_one`` CLI path converts it, and
``EmbeddingModel`` with ``MINIVECTORDB_TPU_WEIGHTS`` loads the artifact as
``weights_source == 'pretrained'`` — embeddings must match the torch forward
(masked mean-pool + L2 norm, reference embedding_model.py:50-71).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    """A real-format checkpoint directory: tiny XLM-R + WordLevel fast tok."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast, XLMRobertaConfig, XLMRobertaModel

    d = tmp_path_factory.mktemp("tiny_hf")
    cfg = XLMRobertaConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(cfg)
    model.eval()
    model.save_pretrained(d)

    words = ["hello", "world", "dogs", "animals", "cars", "i", "like"]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    vocab.update({w: 4 + i for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        bos_token="<s>", eos_token="</s>",
    )
    fast.save_pretrained(d)
    return str(d), model, fast


def test_fetch_one_converts_a_real_checkpoint(hf_checkpoint, tmp_path, monkeypatch):
    src, _, _ = hf_checkpoint
    from minivectordb_tpu.models import fetch_weights
    from minivectordb_tpu.models import configs as model_configs

    monkeypatch.setitem(model_configs.HF_MODEL_NAMES, "small", src)
    dest = fetch_weights.fetch_one("small", str(tmp_path))
    assert os.path.exists(os.path.join(dest, "params.npz"))
    assert os.path.exists(os.path.join(dest, "config.json"))
    assert os.path.exists(os.path.join(dest, "tokenizer.json"))


def test_embedding_model_serves_fetched_artifact_matching_torch(
    hf_checkpoint, tmp_path, monkeypatch
):
    src, model, fast = hf_checkpoint
    from minivectordb_tpu.models import fetch_weights
    from minivectordb_tpu.models import configs as model_configs

    monkeypatch.setitem(model_configs.HF_MODEL_NAMES, "small", src)
    fetch_weights.fetch_one("small", str(tmp_path))
    monkeypatch.setenv("MINIVECTORDB_TPU_WEIGHTS", str(tmp_path))

    from minivectordb_tpu.embedding_model import AlternativeModel, EmbeddingModel

    m = EmbeddingModel(
        use_quantized_onnx_model=False,
        alternative_model=AlternativeModel.small,
    )
    assert m.weights_source == "pretrained"
    assert m.is_pretrained and m.is_trained
    text = "hello world dogs"
    got = np.asarray(m.extract_embeddings(text), dtype=np.float32)

    # torch oracle: same 'passage ' prefix quirk, masked mean-pool, L2 norm
    batch = fast(["passage " + text], return_tensors="pt", padding=True)
    with torch.no_grad():
        out = model(**batch).last_hidden_state
    mask = batch["attention_mask"][..., None].float()
    pooled = (out * mask).sum(1) / mask.sum(1)
    want = torch.nn.functional.normalize(pooled, dim=-1)[0].numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
