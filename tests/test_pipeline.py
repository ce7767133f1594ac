"""Fused embed->search pipeline: must agree with the two-step path."""

import numpy as np

from minivectordb_tpu.core.pipeline import TextSearchPipeline
from minivectordb_tpu.embedding_model import EmbeddingModel
from minivectordb_tpu.vector_database import VectorDatabase

model = EmbeddingModel()


def _build_db():
    db = VectorDatabase()
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta", "iota kappa"]
    for i, t in enumerate(texts, 1):
        db.store_embedding(i, model.extract_embeddings(t), {"i": i})
    return db, texts


def test_fused_matches_two_step():
    db, texts = _build_db()
    pipe = TextSearchPipeline(model, db)
    for q in ["alpha beta gamma", "kappa iota nu"]:
        fused_ids, fused_scores, _ = pipe.search(q, k=3)
        two_ids, two_scores, _ = db.find_most_similar(
            model.extract_embeddings(q), k=3
        )
        assert list(fused_ids) == list(two_ids)
        np.testing.assert_allclose(
            np.asarray(fused_scores, dtype=np.float64),
            np.asarray(two_scores, dtype=np.float64),
            rtol=1e-4, atol=1e-4,
        )


def test_fused_with_filters_and_batch():
    db, texts = _build_db()
    pipe = TextSearchPipeline(model, db)
    ids, _, metas = pipe.search("beta", k=10, metadata_filter={"i": {"$lte": 2}})
    assert set(ids) <= {1, 2}
    assert len(ids) == 2

    results = pipe.search(["alpha beta gamma", "delta epsilon"], k=1)
    assert len(results) == 2
    assert results[0][0][0] == 1
    assert results[1][0][0] == 2


def test_fused_empty_db():
    db = VectorDatabase()
    pipe = TextSearchPipeline(model, db)
    assert pipe.search("anything", k=3) == ([], [], [])
