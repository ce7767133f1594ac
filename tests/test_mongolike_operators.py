"""Mongo-like operator suite — ported from reference
tests/test_mongolike_operators.py (same data, same exact-count assertions).

Note: this build applies ALL operators in a multi-operator dict (proper
range semantics) where the reference applies only the first
(vector_database.py:164,243 quirk); every assertion below still holds.
"""

from datetime import datetime

import numpy as np
import pytest
import uuid

from minivectordb_tpu.vector_database import VectorDatabase


def _build_db():
    db = VectorDatabase()
    embedding_size = 4
    for i in range(250):
        embedding = np.random.rand(embedding_size)
        random_num = np.random.randint(1, 5)
        db.store_embedding(
            f"item_{i}", embedding, metadata_dict={"num_filter": f"test_{random_num}"}
        )
    for i in range(10):
        db.store_embedding(
            f"item_{i + 250}",
            np.random.rand(embedding_size),
            metadata_dict={
                "num_filter": "test_10",
                "value": 10,
                "date": datetime(2021, 1, 1),
            },
        )
    for i in range(10):
        db.store_embedding(
            f"item_{i + 260}",
            np.random.rand(embedding_size),
            metadata_dict={
                "num_filter": "test_20",
                "value": 20,
                "date": datetime(2022, 1, 1),
            },
        )
    return db, embedding_size


def test_multifilters_options():
    db, embedding_size = _build_db()

    results = db.find_most_similar(
        np.random.rand(embedding_size), k=999, metadata_filter={"value": 10}
    )
    for result in results[2]:
        assert result["value"] == 10
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size), k=999, metadata_filter={"value": {"$gte": 10}}
    )
    for result in results[2]:
        assert result["value"] >= 10
    assert len(results[2]) == 20

    results = db.find_most_similar(
        np.random.rand(embedding_size), k=999, metadata_filter={"value": {"$gte": 20}}
    )
    for result in results[2]:
        assert result["value"] >= 20
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size), k=999, metadata_filter={"value": {"$lt": 20}}
    )
    for result in results[2]:
        assert result["value"] < 20
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size), k=999, metadata_filter={"value": {"$lte": 10}}
    )
    for result in results[2]:
        assert result["value"] <= 10
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size), k=999, metadata_filter={"value": {"$ne": 10}}
    )
    for result in results[2]:
        assert result["value"] != 10
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        metadata_filter={"date": {"$gte": datetime(2021, 1, 1)}},
    )
    for result in results[2]:
        assert result["date"] >= datetime(2021, 1, 1)
    assert len(results[2]) == 20

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        metadata_filter={"date": {"$lt": datetime(2022, 1, 1)}},
    )
    for result in results[2]:
        assert result["date"] < datetime(2022, 1, 1)
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        metadata_filter={
            "value": {"$gt": 15},
            "date": {"$gt": datetime(2021, 5, 5)},
        },
    )
    for result in results[2]:
        assert result["value"] > 15
        assert result["date"] > datetime(2021, 5, 5)
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        or_filters=[
            {"value": {"$gte": 10}},
            {"date": {"$lte": datetime(2022, 1, 1)}},
        ],
    )
    for result in results[2]:
        assert result["value"] >= 10 or result["date"] <= datetime(2022, 1, 1)
    assert len(results[2]) == 20

    # range in a single dict — all operators applied (documented fix;
    # passes under the reference's first-op-only quirk too)
    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        metadata_filter={
            "date": {"$gte": datetime(2021, 1, 1), "$lte": datetime(2022, 1, 1)}
        },
    )
    for result in results[2]:
        assert result["date"] >= datetime(2021, 1, 1)
        assert result["date"] <= datetime(2022, 1, 1)
    assert len(results[2]) == 20

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        metadata_filter=[
            {"date": {"$gte": datetime(2021, 1, 1)}},
            {"date": {"$lt": datetime(2022, 1, 1)}},
        ],
    )
    for result in results[2]:
        assert result["date"] >= datetime(2021, 1, 1)
        assert result["date"] < datetime(2022, 1, 1)
    assert len(results[2]) == 10

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        or_filters=[
            {"date": {"$gte": datetime(2021, 1, 1)}},
            {"date": {"$lt": datetime(2022, 1, 1)}},
        ],
    )
    for result in results[2]:
        assert result["date"] >= datetime(2021, 1, 1) or result["date"] < datetime(
            2022, 1, 1
        )
    assert len(results[2]) == 20

    with pytest.raises(Exception):
        db.find_most_similar(
            np.random.rand(embedding_size),
            k=999,
            metadata_filter={"value": {"$invalid": 10}},
        )

    with pytest.raises(Exception):
        db.find_most_similar(
            np.random.rand(embedding_size),
            k=999,
            or_filters=[{"value": {"$invalid": 10}}],
        )


def test_in_operator():
    db = VectorDatabase()
    embedding_size = 4

    first_id = str(uuid.uuid4())
    db.store_embedding(
        first_id,
        np.random.rand(embedding_size),
        metadata_dict={"custom_list": ["a", "b", "c"]},
    )
    second_id = str(uuid.uuid4())
    db.store_embedding(
        second_id,
        np.random.rand(embedding_size),
        metadata_dict={"custom_list": ["d", "e", "f"]},
    )

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=2,
        metadata_filter={"custom_list": {"$in": "a"}},
    )
    assert first_id in results[0]
    assert len(results[0]) == 1

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=2,
        metadata_filter={"custom_list": {"$in": "d"}},
    )
    assert second_id in results[0]
    assert len(results[0]) == 1

    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=2,
        or_filters=[{"custom_list": {"$in": "a"}}, {"custom_list": {"$in": "d"}}],
    )
    assert first_id in results[0]
    assert second_id in results[0]
    assert len(results[0]) == 2


def test_filtering_no_results():
    db = VectorDatabase()
    embedding_size = 4
    for i in range(250):
        db.store_embedding(
            f"item_{i}",
            np.random.rand(embedding_size),
            metadata_dict={"num_filter": f"test_{np.random.randint(1, 5)}", "value": 1},
        )
    results = db.find_most_similar(
        np.random.rand(embedding_size),
        k=999,
        or_filters={"value": 1},
        metadata_filter={"value": 2},
    )
    assert len(results[2]) == 0


def test_unhashable_equality_values():
    """Equality filtering on list-valued metadata (unhashable) — exercised
    through the value-index fallback path."""
    db = VectorDatabase()
    db.store_embedding(1, [1.0, 0.0], {"tags": ["x", "y"]})
    db.store_embedding(2, [0.0, 1.0], {"tags": ["z"]})
    results = db.find_most_similar([1.0, 1.0], k=5, metadata_filter={"tags": ["x", "y"]})
    assert list(results[0]) == [1]
    # exclude with unhashable value
    results = db.find_most_similar([1.0, 1.0], k=5, exclude_filter={"tags": ["z"]})
    assert list(results[0]) == [1]
