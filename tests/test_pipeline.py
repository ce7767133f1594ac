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


def test_pipeline_routes_ivf_databases_through_the_probe():
    """Text search on an index='ivf' database serves from the coarse probe
    (engine search core) instead of the fused exact scan."""
    import numpy as np

    from minivectordb_tpu.embedding_model import EmbeddingModel
    from minivectordb_tpu.core.pipeline import TextSearchPipeline
    from minivectordb_tpu.vector_database import VectorDatabase

    model = EmbeddingModel()
    db = VectorDatabase(
        f"/tmp/pipe_ivf_{np.random.randint(1 << 30)}.pkl",
        index="ivf",
        ivf_opts={"build_threshold": 4, "nlist": 4, "nprobe": 64,
                  "iters": 3},
    )
    sents = ["i like animals", "i like cars", "the sky is blue",
             "dogs are friendly", "engines are loud"]
    for i, s in enumerate(sents, 1):
        db.store_embedding(i, model.extract_embeddings(s), {"i": i})
    pipe = TextSearchPipeline(model, db)
    ids, scores, metas = pipe.search("i like dogs", k=2)
    assert len(ids) == 2
    assert set(ids) <= {1, 2, 3, 4, 5}
    snap = db._engine.telemetry.snapshot()
    assert snap.get("ivf_scan", {}).get("count", 0) >= 1
    # filtered text search still honors the filter through the same route
    ids2, _, metas2 = pipe.search("i like dogs", k=2,
                                  metadata_filter={"i": {"$lte": 2}})
    assert all(m["i"] <= 2 for m in metas2) and len(ids2) == 2
