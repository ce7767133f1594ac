"""Telemetry/stats observability layer."""

import numpy as np

from minivectordb_tpu.utils.telemetry import Telemetry
from minivectordb_tpu.vector_database import VectorDatabase


def test_telemetry_counters_and_timers():
    t = Telemetry()
    with t.timed("op"):
        pass
    with t.timed("op"):
        pass
    t.incr("events", 5)
    snap = t.snapshot()
    assert snap["op"]["count"] == 2
    assert snap["op"]["total_s"] >= 0
    assert snap["events"]["count"] == 5
    t.reset()
    assert t.snapshot() == {}


def test_db_stats_surface():
    db = VectorDatabase()
    rng = np.random.default_rng(0)
    db.store_embeddings_batch([1, 2, 3], list(rng.random((3, 8))))
    db.find_most_similar(rng.random(8), k=2)
    db.find_most_similar(rng.random(8), metadata_filter=None, k=1)
    s = db.stats()
    assert s["count"] == 3
    assert s["embedding_size"] == 8
    assert s["ops"]["device_scan"]["count"] == 2
    assert s["ops"]["filter"]["count"] == 2
    assert s["ops"]["device_scan"]["mean_ms"] >= 0
