"""Flat VectorDatabase suite — ported from reference tests/test_vector_database.py
(same flows and assertions; file/line cites refer to the reference).

Semantic-quality assertions (e.g. "dogs" ranking "animals" first,
reference :195-270) require pretrained encoder weights and are gated on
``model.is_pretrained``; every structural/count/API assertion runs
unconditionally.
"""

import os
import uuid

import numpy as np
import pytest

from minivectordb_tpu.embedding_model import EmbeddingModel
from minivectordb_tpu.vector_database import VectorDatabase

model = EmbeddingModel()

semantic = pytest.mark.skipif(
    not model.is_trained,
    reason="trained encoder weights unavailable (seeded fallback has "
    "correct dims but no semantics)",
)


def test_initialization():
    db = VectorDatabase()
    assert db.embedding_size is None
    assert len(db.id_map) == 0
    assert len(db.inverse_id_map) == 0


def test_store_and_retrieve_embedding():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5])
    assert db.embedding_size == 2
    assert len(db.id_map) == 1
    assert 1 in db.inverse_id_map


def test_store_embedding_with_metadata_filter():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5], {"type": "abc"})
    db.store_embedding(2, [0.1, 0.1], {"type": "xyz"})

    ids, distances, metadatas = db.find_most_similar([0.7, 0.7], {"type": "abc"})

    assert len(ids) == 1
    assert len(distances) == 1
    assert len(metadatas) == 1
    assert ids[0] == 1


def test_store_embedding_with_metadata_filter_and_exclude_filter():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5], {"type": "abc", "id": 1})
    db.store_embedding(2, [0.1, 0.1], {"type": "xyz", "id": "2"})
    db.store_embedding(3, [0.1, 0.1], {"type": "other", "id": 555})

    ids, distances, metadatas = db.find_most_similar(
        embedding=[0.7, 0.7],
        metadata_filter={"type": "abc"},
        exclude_filter={"type": "other"},
        k=10,
    )
    assert len(ids) == 1
    assert len(distances) == 1
    assert len(metadatas) == 1

    ids, distances, metadatas = db.find_most_similar(
        embedding=[0.7, 0.7],
        metadata_filter={},
        exclude_filter=[{"type": "abc"}, {"type": "xyz"}],
        k=10,
    )
    assert len(ids) == 1
    assert len(distances) == 1
    assert len(metadatas) == 1

    # Exclude-everything iteration (reference :69-97)
    seen_metadata = []
    seen_ids = set()
    it_count = 0
    while it_count < 10:
        exclude = [{"id": id} for id in seen_ids]
        _, _, metadatas = db.find_most_similar(
            embedding=[0.7, 0.7], metadata_filter={}, exclude_filter=exclude, k=1
        )
        if len(metadatas) == 0:
            break
        assert metadatas[0]["id"] not in seen_ids
        seen_metadata.extend(metadatas)
        seen_ids.update([m["id"] for m in metadatas])
        it_count += 1

    assert len(seen_metadata) == 3
    assert len(seen_ids) == 3
    assert it_count == 3


def test_store_embedding_with_exclude_filter_none_remains():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5], {"type": "abc"})
    db.store_embedding(3, [0.1, 0.1], {"kind": "other"})

    ids, distances, metadatas = db.find_most_similar(
        embedding=[0.7, 0.7],
        exclude_filter={"kind": "other", "type": "abc"},
        k=10,
    )
    assert len(ids) == 0
    assert len(distances) == 0
    assert len(metadatas) == 0


def test_store_then_delete_with_stored_metadata():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5], {"type": "abc"})
    db.delete_embedding(1)
    ids, distances, metadatas = db.find_most_similar([0.7, 0.7], {"type": "abc"})
    assert len(ids) == 0
    assert len(distances) == 0
    assert len(metadatas) == 0


def test_store_embeddings_with_multiple_metadata_filters():
    db = VectorDatabase()
    db.store_embedding("1", [0.5, 0.5], {"type": "abc", "category": "first"})
    db.store_embedding("2", [0.6, 0.6], {"type": "abc", "category": "second"})
    db.store_embedding("3", [0.7, 0.7], {"type": "xyz", "category": "first"})
    db.store_embedding("4", [0.8, 0.8], {"type": "xyz", "category": "second"})

    ids, distances, metadatas = db.find_most_similar(
        [0.5, 0.5], {"type": "abc", "category": "first"}
    )
    assert len(ids) == 1
    assert len(distances) == 1
    assert len(metadatas) == 1
    assert ids[0] == "1"


def test_try_retrieve_k_higher_than_existing_embedding_count():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5])
    db.store_embedding(2, [0.1, 0.1])
    ids, distances, metadatas = db.find_most_similar([0.7, 0.7], k=3)
    assert len(ids) == 2
    assert len(distances) == 2
    assert len(metadatas) == 2


def test_retrieve_embeddings_when_none_indexed():
    db = VectorDatabase()
    ids, distances, metadatas = db.find_most_similar([0.5, 0.5], k=3)
    assert len(ids) == 0
    assert len(distances) == 0
    assert len(metadatas) == 0


def test_delete_embedding():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5])
    db.delete_embedding(1)
    assert len(db.id_map) == 0
    assert 1 not in db.inverse_id_map


def test_persist_and_load():
    storage_file_tmp = f"{uuid.uuid4()}.pkl"
    db = VectorDatabase(storage_file=storage_file_tmp)
    db.store_embedding(1, model.extract_embeddings("This is a test 1"))
    db.store_embedding(2, model.extract_embeddings("This is a test 2"))
    db.store_embedding(3, model.extract_embeddings("This is a test 3"))
    db.persist_to_disk()

    db2 = VectorDatabase(storage_file=storage_file_tmp)
    os.remove(storage_file_tmp)

    assert len(db2.id_map) == 3
    assert 1 in db2.inverse_id_map
    assert 2 in db2.inverse_id_map
    assert 3 in db2.inverse_id_map


def test_pickle_schema_reference_compatible():
    """The persisted file must carry the exact reference schema keys
    (reference vector_database.py:538-548)."""
    import pickle

    storage_file_tmp = f"{uuid.uuid4()}.pkl"
    db = VectorDatabase(storage_file=storage_file_tmp)
    db.store_embedding("a", [1.0, 0.0], {"type": "x"})
    db.persist_to_disk()
    with open(storage_file_tmp, "rb") as f:
        data = pickle.load(f)
    os.remove(storage_file_tmp)
    assert set(data.keys()) == {
        "embeddings",
        "metadata",
        "id_map",
        "inverse_id_map",
        "inverted_index",
    }
    assert data["embeddings"].dtype == np.float32
    assert data["id_map"] == {0: "a"}
    assert data["inverse_id_map"] == {"a": 0}
    assert dict(data["inverted_index"]) == {"type": {"a"}}


@semantic
def test_valid_similarity_search_quant():
    db = VectorDatabase()
    sentences = [(1, "i like animals"), (2, "i like cars"), (3, "i like programming")]
    for id, sentence in sentences:
        db.store_embedding(id, model.extract_embeddings(sentence))
    query_embedding = model.extract_embeddings("i like dogs")
    ids, distances, metadatas = db.find_most_similar(query_embedding, k=2)
    assert len(ids) == 2
    assert ids[0] == 1


def test_similarity_search_structure():
    """Structural half of the reference's semantic tests: counts, ordering by
    score, autocut wiring — with deterministic synthetic vectors."""
    db = VectorDatabase()
    # vectors with known cosine ordering vs the query [1, 0]
    db.store_embedding(1, [1.0, 0.05])
    db.store_embedding(2, [1.0, 1.0])
    db.store_embedding(3, [0.0, 1.0])
    ids, distances, _ = db.find_most_similar([1.0, 0.0], k=2)
    assert len(ids) == 2
    assert ids[0] == 1 and ids[1] == 2
    assert distances[0] > distances[1]

    # autocut: big drop after the first result cuts the tail
    ids, distances, _ = db.find_most_similar([1.0, 0.0], k=3, autocut=True)
    assert ids[0] == 1
    assert len(ids) < 3

    # no-drop case returns everything
    db2 = VectorDatabase()
    db2.store_embedding(1, [1.0, 0.0])
    db2.store_embedding(2, [0.99, 0.01])
    db2.store_embedding(3, [0.98, 0.02])
    ids, _, _ = db2.find_most_similar([1.0, 0.0], k=3, autocut=True)
    assert len(ids) == 3


def test_hybrid_rerank_structure():
    """Rerank flow with synthetic sentences (reference :272-303 semantics
    gated; this checks the machinery: combination, ordering, trimming)."""
    db = VectorDatabase()
    sentences = ["the quick brown fox", "a lazy dog sleeps", "quantum flux peaks"]
    scores = [0.9, 0.8, 0.7]
    ranked_sentences, ranked_scores = db.hybrid_rerank_results(
        sentences, scores, query="the quick brown fox", k=2
    )
    assert len(ranked_sentences) == 2
    assert len(ranked_scores) == 2
    # exact textual match must rank first (hash cosine ~1, fuzzy 100)
    assert ranked_sentences[0] == "the quick brown fox"
    assert ranked_scores[0] > ranked_scores[1]


def test_unique_id_validation():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5])
    with pytest.raises(ValueError):
        db.store_embedding(1, [0.5, 0.5])


def test_delete_nonexistent_id():
    db = VectorDatabase()
    with pytest.raises(ValueError):
        db.delete_embedding(1)


def test_delete_embedding_rebuilds_id_map():
    db = VectorDatabase()
    db.store_embedding(1, [0.5, 0.5])
    db.store_embedding(2, [0.1, 0.1])
    db.store_embedding(3, [0.2, 0.2])
    assert len(db.id_map) == 3
    db.delete_embedding(2)
    assert len(db.id_map) == 2
    assert db.id_map == {0: 1, 1: 3}


def test_retrieve_embedding_by_id():
    db = VectorDatabase()
    test_embedding = [0.5, 0.5]
    db.store_embedding(1, test_embedding)
    embedding = db.get_vector(1)
    assert (embedding == test_embedding).all()


def test_retrieve_embedding_by_id_nonexistent():
    db = VectorDatabase()
    with pytest.raises(ValueError):
        db.get_vector(1)


def test_search_expansion_metadata_filters():
    db = VectorDatabase()
    embedding_size = 32
    for i in range(250):
        embedding = np.random.rand(embedding_size)
        random_num = np.random.randint(1, 5)
        db.store_embedding(
            f"item_{i}", embedding, metadata_dict={"num_filter": f"test_{random_num}"}
        )
    for i in range(5):
        embedding = np.random.rand(embedding_size)
        db.store_embedding(
            f"item_{i + 250}", embedding, metadata_dict={"num_filter": "test_99"}
        )
    ids, _, _ = db.find_most_similar(
        embedding=np.random.rand(embedding_size),
        metadata_filter={"num_filter": "test_99"},
        k=2,
    )
    assert len(ids) == 2


def test_search_expansion_metadata_filters_with_or_filters():
    db = VectorDatabase()
    embedding_size = 32
    for i in range(250):
        embedding = np.random.rand(embedding_size)
        random_num = np.random.randint(1, 5)
        db.store_embedding(
            f"item_{i}", embedding, metadata_dict={"num_filter": f"test_{random_num}"}
        )
    for i in range(5):
        embedding = np.random.rand(embedding_size)
        db.store_embedding(
            f"item_{i + 250}",
            embedding,
            metadata_dict={"num_filter": "test_99", "type": "test"},
        )
    ids, _, _ = db.find_most_similar(
        embedding=np.random.rand(embedding_size),
        or_filters=[
            {"num_filter": "test_99"},
            {"num_filter": "test_10"},
            {"num_filter": "test_20"},
        ],
        k=10,
    )
    assert len(ids) == 5

    ids, _, _ = db.find_most_similar(
        embedding=np.random.rand(embedding_size),
        metadata_filter={"type": "test"},
        or_filters=[
            {"num_filter": "test_99"},
            {"num_filter": "test_10"},
            {"num_filter": "test_20"},
        ],
        k=500,
    )
    assert len(ids) == 5

    embedding = np.random.rand(embedding_size)
    db.store_embedding(
        "item_300", embedding, metadata_dict={"num_filter": "test_101", "type": "test"}
    )
    ids, _, _ = db.find_most_similar(
        embedding=np.random.rand(embedding_size),
        metadata_filter={"type": "test"},
        or_filters={"num_filter": "test_101"},
        k=10,
    )
    assert len(ids) == 1


def test_search_expansion_metadata_filters_high_k_exact_count():
    """Exact-count semantics under filters (reference :471-503) with
    synthetic vectors: k=10 but only 3 candidates match the filter."""
    db = VectorDatabase()
    rng = np.random.default_rng(0)
    for i in range(7):
        db.store_embedding(str(i + 1), rng.random(16), {"category": "irrelevant"})
    for i in range(3):
        db.store_embedding(str(i + 8), rng.random(16), {"category": "relevant"})

    ids, _, _ = db.find_most_similar(
        embedding=rng.random(16), metadata_filter={"category": "relevant"}, k=10
    )
    assert len(ids) == 3
    assert set(ids) == {"8", "9", "10"}


def test_batch_indexing():
    db = VectorDatabase()
    rng = np.random.default_rng(1)
    embeddings = [rng.random(64) for _ in range(4)]
    ids = [1, 2, 3, 4]
    db.store_embeddings_batch(ids, embeddings)
    assert len(db.id_map) == 4

    # query equal to vector 1 must return id 1 first
    found_ids, _, _ = db.find_most_similar(embeddings[0], k=1)
    assert found_ids[0] == 1

    new_embedding = rng.random(64)
    with pytest.raises(ValueError):
        db.store_embeddings_batch([1, 2], [new_embedding, new_embedding])
    with pytest.raises(ValueError):
        db.store_embeddings_batch(
            [9, 8, 25], [new_embedding, new_embedding], [{"type": "test"}]
        )
    db.store_embeddings_batch(
        [5, 6], [new_embedding, new_embedding], [{"type": "test"}, {"type": "test"}]
    )
    assert {"type": "test"} in db.metadata


def test_hybrid_rerank_with_empty_database():
    db = VectorDatabase()
    query = "cars and animals"
    query_embedding = model.extract_embeddings(query)
    ids, distances, _ = db.find_most_similar(query_embedding, k=3)
    sentences = [None for _ in ids]
    ranked_sentences, ranked_scores = db.hybrid_rerank_results(
        sentences, distances, query, k=2
    )
    assert len(ranked_sentences) == 0
    assert len(ranked_scores) == 0


def test_batched_query_api():
    """find_most_similar_batch: one device program, B queries."""
    db = VectorDatabase()
    rng = np.random.default_rng(2)
    mat = rng.random((50, 32)).astype(np.float32)
    db.store_embeddings_batch(list(range(50)), list(mat))
    queries = mat[[3, 17, 40]]
    results = db.find_most_similar_batch(queries, k=1)
    assert len(results) == 3
    assert [r[0][0] for r in results] == [3, 17, 40]


def test_load_reference_written_pickle():
    """A db.pkl written by the REFERENCE (faiss-normalized embeddings,
    defaultdict inverted_index, int-keyed id_map) must load and serve."""
    import pickle
    from collections import defaultdict

    emb = np.asarray([[1.0, 0.0], [0.6, 0.8]], dtype=np.float32)  # L2-normed
    inv = defaultdict(set)
    inv["type"].update({7, 9})
    data = {
        "embeddings": emb,
        "metadata": [{"type": "a"}, {"type": "b"}],
        "id_map": {0: 7, 1: 9},
        "inverse_id_map": {7: 0, 9: 1},
        "inverted_index": inv,
    }
    path = f"{uuid.uuid4()}.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    try:
        db = VectorDatabase(storage_file=path)
        assert db.embedding_size == 2
        assert db.id_map == {0: 7, 1: 9}
        ids, scores, metas = db.find_most_similar([1.0, 0.0], k=2)
        assert list(ids) == [7, 9]
        ids, _, _ = db.find_most_similar([1.0, 0.0], metadata_filter={"type": "b"}, k=2)
        assert list(ids) == [9]
        db.delete_embedding(7)
        assert db.id_map == {0: 9}
    finally:
        os.remove(path)


def test_persist_to_disk_is_atomic():
    """A crash mid-persist must leave the previous snapshot intact: the
    write goes to a temp file and renames over the target (the reference
    pickles in place — a torn file there poisons every future load)."""
    import os as _os
    import uuid as _uuid

    import numpy as _np

    path = f"/tmp/atomic_{_uuid.uuid4().hex}.pkl"
    db = VectorDatabase(path)
    db.store_embedding(1, _np.ones(8, dtype=_np.float32), {"a": 1})
    db.persist_to_disk()

    # simulate the crash window: the temp file exists mid-write and the
    # real file is untouched until the rename
    real_open = open
    seen = {}

    def failing_dump(data, f):
        seen["tmp"] = f.name
        raise RuntimeError("simulated crash mid-pickle")

    import minivectordb_tpu.vector_database as vd_mod

    orig = vd_mod.pickle.dump
    vd_mod.pickle.dump = failing_dump
    try:
        db.store_embedding(2, _np.zeros(8, dtype=_np.float32))
        try:
            db.persist_to_disk()
        except RuntimeError:
            pass
    finally:
        vd_mod.pickle.dump = orig
    assert seen["tmp"].endswith(".tmp")
    # the previous snapshot survived the crash untouched
    db2 = VectorDatabase(path)
    assert len(db2.id_map) == 1
