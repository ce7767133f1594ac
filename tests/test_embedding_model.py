"""EmbeddingModel suite — ported from reference tests/test_embedding_model.py
(same backend/dimensionality contracts), plus batch-API coverage."""

import numpy as np

from minivectordb_tpu.embedding_model import AlternativeModel, EmbeddingModel


def test_load_onnx_model():
    quant_model = EmbeddingModel(use_quantized_onnx_model=True)
    assert quant_model.model is not None, "Builtin model should be loaded"
    embedding = quant_model.extract_embeddings("This is a sample text")
    assert embedding is not None
    embedding = quant_model.extract_embeddings("This is a sample text")
    assert len(embedding) == 512


def test_load_onnx_model_custom_cpu_core_count():
    quant_model = EmbeddingModel(use_quantized_onnx_model=True, onnx_model_cpu_core_count=1)
    assert quant_model.model is not None
    embedding = quant_model.extract_embeddings("This is a sample text")
    assert embedding is not None
    assert len(embedding) == 512


def test_load_small_alternative_model():
    m = EmbeddingModel(
        use_quantized_onnx_model=False, alternative_model=AlternativeModel.small
    )
    assert m.model is not None
    embedding = m.extract_embeddings("This is a sample text")
    assert embedding is not None
    assert len(embedding) == 384


def test_load_small_alternative_model_retrocompatibility_args():
    m = EmbeddingModel(use_quantized_onnx_model=False, e5_model_size="small")
    assert m.model is not None
    embedding = m.extract_embeddings("This is a sample text")
    assert embedding is not None
    assert len(embedding) == 384


def test_load_large_alternative_model():
    m = EmbeddingModel(
        use_quantized_onnx_model=False, alternative_model=AlternativeModel.large
    )
    assert m.model is not None
    embedding = m.extract_embeddings("This is a sample text")
    assert embedding is not None
    assert len(embedding) == 1024


def test_load_bgem3_alternative_model():
    m = EmbeddingModel(
        use_quantized_onnx_model=False, alternative_model=AlternativeModel.bgem3
    )
    assert m.model is not None
    embedding = m.extract_embeddings("This is a sample text")
    assert embedding is not None
    assert len(embedding) == 1024


def test_embeddings_deterministic_and_normalized():
    m = EmbeddingModel(use_quantized_onnx_model=True)
    e1 = np.asarray(m.extract_embeddings("determinism check"))
    e2 = np.asarray(m.extract_embeddings("determinism check"))
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-3


def test_batch_embedding_matches_single():
    m = EmbeddingModel(use_quantized_onnx_model=True)
    texts = ["first text", "a different second text", "third"]
    batch = m.extract_embeddings_batch(texts)
    assert batch.shape == (3, 512)
    for i, t in enumerate(texts):
        single = np.asarray(m.extract_embeddings(t))
        np.testing.assert_allclose(batch[i], single, rtol=2e-2, atol=2e-2)


def test_bfloat16_compute_dtype_close_to_float32():
    m32 = EmbeddingModel(use_quantized_onnx_model=True)
    m16 = EmbeddingModel(use_quantized_onnx_model=True, compute_dtype="bfloat16")
    e32 = np.asarray(m32.extract_embeddings("precision check sentence"))
    e16 = np.asarray(m16.extract_embeddings("precision check sentence"))
    assert e16.dtype == np.float32  # pooling outputs f32
    # same direction: high cosine between the two embeddings
    cos = float(e32 @ e16 / (np.linalg.norm(e32) * np.linalg.norm(e16)))
    assert cos > 0.999, cos


def test_warmup_is_idempotent_and_primes():
    from minivectordb_tpu.embedding_model import EmbeddingModel

    m = EmbeddingModel()
    m.warmup()
    m.warmup(batch=2)
    out = m.extract_embeddings("dogs are loyal")
    assert len(out) == 512
