"""Shared sharded-database test suite, ported from reference
tests/test_sharded_vector_database.py and
tests/test_sharded_vector_database_usearch.py (the two reference files differ
only in setup + class name — same 28 test bodies; here the suite is written
once and parameterized by database class).
"""

import shutil
import uuid
from contextlib import contextmanager

import numpy as np
import pytest


@contextmanager
def temp_dir_db(cls, **kwargs):
    folder = f"./tmp_shards_{uuid.uuid4().hex[:8]}"
    try:
        yield folder
    finally:
        shutil.rmtree(folder, ignore_errors=True)


class ShardedSuite:
    """Subclass with `db_cls` set; pytest collects the methods."""

    db_cls = None
    lower_is_better = False

    def make(self, folder, **kwargs):
        return self.db_cls(storage_dir=folder, **kwargs)

    def test_initialization(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            assert db.embedding_size is None
            assert len(db.inverse_id_map) == 0

    def test_store_and_retrieve_embedding(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5])
            assert db.embedding_size == 2
            assert 1 in db.inverse_id_map
            assert len(db.inverse_id_map) == 1

    def test_store_embedding_with_metadata_filter(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5], {"type": "abc"})
            db.store_embedding(2, [0.1, 0.1], {"type": "xyz"})
            ids, distances, metadatas = db.find_most_similar([0.7, 0.7], {"type": "abc"})
            assert len(ids) == 1
            assert len(distances) == 1
            assert len(metadatas) == 1
            assert ids[0] == 1

    def test_store_embedding_with_metadata_filter_and_exclude_filter(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5], {"type": "abc", "id": 1})
            db.store_embedding(2, [0.1, 0.1], {"type": "xyz", "id": "2"})
            db.store_embedding(3, [0.1, 0.1], {"type": "other", "id": 555})

            ids, distances, metadatas = db.find_most_similar(
                embedding=[0.7, 0.7],
                metadata_filter={"type": "abc"},
                exclude_filter={"type": "other"},
                k=10,
            )
            assert len(ids) == 1 and len(distances) == 1 and len(metadatas) == 1

            ids, distances, metadatas = db.find_most_similar(
                embedding=[0.7, 0.7],
                metadata_filter={},
                exclude_filter=[{"type": "abc"}, {"type": "xyz"}],
                k=10,
            )
            assert len(ids) == 1 and len(distances) == 1 and len(metadatas) == 1

            seen_metadata, seen_ids, it_count = [], set(), 0
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

    def test_store_embedding_with_exclude_filter_none_remains(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5], {"type": "abc"})
            db.store_embedding(3, [0.1, 0.1], {"kind": "other"})
            ids, distances, metadatas = db.find_most_similar(
                embedding=[0.7, 0.7],
                exclude_filter={"kind": "other", "type": "abc"},
                k=10,
            )
            assert len(ids) == 0 and len(distances) == 0 and len(metadatas) == 0

    def test_store_then_delete_with_stored_metadata(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5], {"type": "abc"})
            db.delete_embeddings_batch(1)
            ids, distances, metadatas = db.find_most_similar([0.7, 0.7], {"type": "abc"})
            assert len(ids) == 0 and len(distances) == 0 and len(metadatas) == 0

    def test_store_embeddings_with_multiple_metadata_filters(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding("1", [0.5, 0.5], {"type": "abc", "category": "first"})
            db.store_embedding("2", [0.6, 0.6], {"type": "abc", "category": "second"})
            db.store_embedding("3", [0.7, 0.7], {"type": "xyz", "category": "first"})
            db.store_embedding("4", [0.8, 0.8], {"type": "xyz", "category": "second"})
            ids, distances, metadatas = db.find_most_similar(
                [0.5, 0.5], {"type": "abc", "category": "first"}
            )
            assert len(ids) == 1 and len(distances) == 1 and len(metadatas) == 1
            assert ids[0] == "1"

    def test_try_retrieve_k_higher_than_existing_embedding_count(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5])
            db.store_embedding(2, [0.1, 0.1])
            ids, distances, metadatas = db.find_most_similar([0.7, 0.7], k=3)
            assert len(ids) == 2 and len(distances) == 2 and len(metadatas) == 2

    def test_retrieve_embeddings_when_none_indexed(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            ids, distances, metadatas = db.find_most_similar([0.5, 0.5], k=3)
            assert len(ids) == 0 and len(distances) == 0 and len(metadatas) == 0

    def test_delete_embedding(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5])
            db.delete_embeddings_batch(1)
            assert 1 not in db.inverse_id_map
            assert len(db.inverse_id_map) == 0

    def test_persist_and_load(self):
        with temp_dir_db(self.db_cls) as folder:
            rng = np.random.default_rng(7)
            db = self.make(folder, shard_size=2)
            db.store_embedding(1, rng.random(32))
            db.store_embedding(2, rng.random(32))
            db.store_embedding(3, rng.random(32))

            db2 = self.make(folder, shard_size=2)
            assert len(db2.inverse_id_map) == 3
            assert 1 in db2.inverse_id_map
            assert 2 in db2.inverse_id_map
            assert 3 in db2.inverse_id_map
            # shard_size=2 with 3 vectors must produce 2 shard files
            assert len(db2.box_item_map) == 2

    def test_similarity_search_structure(self):
        """Deterministic-geometry version of the reference's semantic search
        tests (reference :209-233, gated on pretrained weights elsewhere)."""
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [1.0, 0.02])
            db.store_embedding(2, [1.0, 1.0])
            db.store_embedding(3, [0.0, 1.0])
            ids, distances, metadatas = db.find_most_similar([1.0, 0.0], k=2)
            assert len(ids) == 2 and len(distances) == 2 and len(metadatas) == 2
            assert ids[0] == 1
            if self.lower_is_better:
                assert distances[0] <= distances[1]
            else:
                assert distances[0] >= distances[1]

    def test_unique_id_validation(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5])
            with pytest.raises(ValueError):
                db.store_embedding(1, [0.5, 0.5])

    def test_delete_nonexistent_id(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            with pytest.raises(ValueError):
                db.delete_embeddings_batch(1)

    def test_delete_embedding_rebuilds_id_map(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5])
            db.store_embedding(2, [0.1, 0.1])
            db.store_embedding(3, [0.2, 0.2])
            assert len(db.inverse_id_map) == 3
            db.delete_embeddings_batch(2)
            assert len(db.inverse_id_map) == 2
            assert db.inverse_id_map == {1: 0, 3: 1}

    def test_retrieve_embedding_by_id(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            test_embedding = [0.5, 0.5]
            db.store_embedding(1, test_embedding)
            embedding = db.get_vector(1)
            assert (embedding == test_embedding).all()

    def test_retrieve_embedding_by_id_nonexistent(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            with pytest.raises(ValueError):
                db.get_vector(1)

    def test_get_vector_across_shards(self):
        """get_vector must return the right vector even when the uid lives in
        a later shard (the reference indexes the shard file with the GLOBAL
        row index, sharded_vector_database.py:91-96 — a latent bug this build
        fixes by locating the uid within its shard)."""
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder, shard_size=2)
            vecs = {i: [float(i), float(i) + 0.5] for i in range(6)}
            for i, v in vecs.items():
                db.store_embedding(i, v)
            for i, v in vecs.items():
                assert (db.get_vector(i) == np.asarray(v, dtype=np.float32)).all()

    def test_search_expansion_metadata_filters(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            embedding_size = 32
            for i in range(250):
                db.store_embedding(
                    f"item_{i}",
                    np.random.rand(embedding_size),
                    metadata_dict={"num_filter": f"test_{np.random.randint(1, 5)}"},
                )
            for i in range(5):
                db.store_embedding(
                    f"item_{i + 250}",
                    np.random.rand(embedding_size),
                    metadata_dict={"num_filter": "test_99"},
                )
            ids, _, _ = db.find_most_similar(
                embedding=np.random.rand(embedding_size),
                metadata_filter={"num_filter": "test_99"},
                k=2,
            )
            assert len(ids) == 2

    def test_search_expansion_metadata_filters_with_or_filters(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            embedding_size = 32
            for i in range(250):
                db.store_embedding(
                    f"item_{i}",
                    np.random.rand(embedding_size),
                    metadata_dict={"num_filter": f"test_{np.random.randint(1, 5)}"},
                )
            for i in range(5):
                db.store_embedding(
                    f"item_{i + 250}",
                    np.random.rand(embedding_size),
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

            db.store_embedding(
                "item_300",
                np.random.rand(embedding_size),
                metadata_dict={"num_filter": "test_101", "type": "test"},
            )
            ids, _, _ = db.find_most_similar(
                embedding=np.random.rand(embedding_size),
                metadata_filter={"type": "test"},
                or_filters={"num_filter": "test_101"},
                k=10,
            )
            assert len(ids) == 1

            ids, _, _ = db.find_most_similar(
                embedding=np.random.rand(embedding_size),
                or_filters=[{"num_filter": "test_101"}, {"num_filter": "test_99"}],
                k=7,
            )
            assert len(ids) == 6

    def test_search_expansion_metadata_filters_high_k_exact_count(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            rng = np.random.default_rng(11)
            for i in range(7):
                db.store_embedding(str(i + 1), rng.random(16), {"category": "irrelevant"})
            for i in range(3):
                db.store_embedding(str(i + 8), rng.random(16), {"category": "relevant"})
            ids, _, _ = db.find_most_similar(
                embedding=rng.random(16), metadata_filter={"category": "relevant"}, k=10
            )
            assert len(ids) == 3

    def test_batch_indexing(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            rng = np.random.default_rng(13)
            embeddings = [rng.random(64) for _ in range(4)]
            db.store_embeddings_batch([1, 2, 3, 4], embeddings)
            assert len(db.inverse_id_map) == 4

            ids, _, _ = db.find_most_similar(embeddings[0], k=1)
            assert ids[0] == 1

            new_embedding = rng.random(64)
            with pytest.raises(ValueError):
                db.store_embeddings_batch([1, 2], [new_embedding, new_embedding])
            with pytest.raises(ValueError):
                db.store_embeddings_batch(
                    [9, 8, 25], [new_embedding, new_embedding], [{"type": "test"}]
                )
            db.store_embeddings_batch(
                [5, 6],
                [new_embedding, new_embedding],
                [{"type": "test"}, {"type": "test"}],
            )
            assert {"type": "test"} in db.metadata

    def test_hybrid_rerank_with_empty_database(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            ids, distances, _ = db.find_most_similar(np.random.rand(8), k=3)
            sentences = [None for _ in ids]
            ranked, scores = db.hybrid_rerank_results(
                sentences, distances, "cars and animals", k=2
            )
            assert len(ranked) == 0
            assert len(scores) == 0

    def test_trying_to_delete_nonexisting_together_with_existing_ids(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [0.5, 0.5])
            db.store_embedding(2, [0.1, 0.1])
            db.store_embedding(3, [0.2, 0.2])
            assert len(db.inverse_id_map) == 3
            with pytest.raises(ValueError):
                db.delete_embeddings_batch([2, 4])
            with pytest.raises(ValueError):
                db.delete_embeddings_batch(None)
            with pytest.raises(ValueError):
                db.delete_embeddings_batch([])

    def test_migrate_from_non_sharded_version(self):
        from minivectordb_tpu.vector_database import VectorDatabase

        with temp_dir_db(self.db_cls) as folder:
            sdb = self.make(folder)
            vdb = VectorDatabase()
            vdb.store_embedding(1, [0.5, 0.5])
            vdb.store_embedding(2, [0.1, 0.1])
            vdb.store_embedding(3, [0.2, 0.2])
            sdb._convert_from_non_sharded_db(vdb)
            assert len(sdb.inverse_id_map) == 3

    def test_index_then_delete_everything_and_reload(self):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder, shard_size=50)
            for i in range(1000):
                db.store_embedding(i, np.random.rand(64))
            ids, _, _ = db.find_most_similar(np.random.rand(64), k=500)
            db.delete_embeddings_batch(list(ids))

            db = self.make(folder, shard_size=50)
            assert len(db.inverse_id_map) == 500

            ids, _, _ = db.find_most_similar(np.random.rand(64), k=500)
            db.delete_embeddings_batch(list(ids))

            db = self.make(folder, shard_size=50)
            assert len(db.inverse_id_map) == 0

    def test_shard_files_reference_schema(self):
        """Shard pickles must carry the exact reference schema
        (reference sharded_vector_database.py:141-142) so directories are
        interchangeable between implementations."""
        import os
        import pickle

        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder, shard_size=2)
            db.store_embedding("a", [1.0, 2.0], {"k": "v"})
            db.store_embedding("b", [3.0, 4.0])
            db.store_embedding("c", [5.0, 6.0])
            files = sorted(os.listdir(folder))
            assert files == ["shard_0.pkl", "shard_1.pkl"]
            with open(os.path.join(folder, "shard_0.pkl"), "rb") as f:
                data = pickle.load(f)
            assert set(data.keys()) == {
                "embeddings",
                "metadata",
                "unique_ids",
                "inverted_index",
            }
            assert data["unique_ids"] == ["a", "b"]
            assert data["embeddings"].dtype == np.float32
            assert isinstance(data["inverted_index"], dict)
            assert data["inverted_index"]["k"] == {"a"}

    # -- semantic tests (reference test_sharded_vector_database.py:195-270
    #    and the usearch mirror :195-345): require a real encoder — run
    #    against the bundled trained builtin, skip the e5 slots offline ----

    def _semantic_model(self, kind="builtin"):
        from minivectordb_tpu.embedding_model import EmbeddingModel

        if kind == "builtin":
            m = EmbeddingModel()
        else:
            m = EmbeddingModel(use_quantized_onnx_model=False,
                               alternative_model=kind)
        if not m.is_trained:
            pytest.skip(f"trained weights for '{kind}' unavailable offline")
        return m

    def _semantic_search_body(self, model):
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            for uid, s in [(1, "i like animals"), (2, "i like cars"),
                           (3, "i like programming")]:
                db.store_embedding(uid, model.extract_embeddings(s))
            ids, distances, metadatas = db.find_most_similar(
                model.extract_embeddings("i like dogs"), k=2
            )
            assert len(ids) == 2 and len(distances) == 2 and len(metadatas) == 2
            assert ids[0] == 1  # dogs -> animals first

    def test_valid_similarity_search_quant(self):
        self._semantic_search_body(self._semantic_model("builtin"))

    def test_valid_similarity_search_non_quant_small(self):
        self._semantic_search_body(self._semantic_model("small"))

    def test_valid_similarity_search_non_quant_large(self):
        self._semantic_search_body(self._semantic_model("large"))

    def test_similarity_search_with_hybrid_reranking(self):
        model = self._semantic_model("builtin")
        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            sentences = [
                (1, "i like animals"),
                (2, "i like cars"),
                (3, "i like programming"),
                (4, "technology is the future"),
            ]
            for uid, s in sentences:
                db.store_embedding(uid, model.extract_embeddings(s))

            query = "cars and animals"
            ids, distances, _ = db.find_most_similar(
                model.extract_embeddings(query), k=3
            )
            retrieved = [dict(sentences)[i] for i in ids]
            reranked, scores = db.hybrid_rerank_results(
                retrieved, list(distances), query, k=2
            )
            assert len(reranked) == 2 and len(scores) == 2
            assert 1 in ids and 2 in ids

            ids, _, _ = db.find_most_similar(
                model.extract_embeddings("technology rocks"), k=4, autocut=True
            )
            assert len(ids) == 1 and ids[0] == 4

            ids, _, _ = db.find_most_similar(
                model.extract_embeddings(
                    "animals, cars, programming, technology"
                ),
                k=4,
                autocut=True,
            )
            assert len(ids) == 4 and {1, 2, 3, 4} == set(ids)
