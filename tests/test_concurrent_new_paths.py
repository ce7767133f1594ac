"""Concurrency stress for the round-3 additions: the device filter-mask
cache under racing writers, and the embed router under concurrent embeds.

The engine's race-safety contract (STATUS §5): scans run OUTSIDE the lock on
immutable snapshots; caches must never surface an exception or a stale mask
pairing to a caller.
"""

import threading

import numpy as np
import pytest

from minivectordb_tpu.core import store as store_mod
from minivectordb_tpu.vector_database import VectorDatabase


def test_filtered_searches_race_mutations(tmp_path, monkeypatch):
    monkeypatch.setattr(store_mod, "_HOST_SCAN_MAX_BYTES", 0)  # device path
    db = VectorDatabase(storage_file=str(tmp_path / "c.pkl"))
    rng = np.random.default_rng(0)
    d = 16
    mat = rng.standard_normal((256, d)).astype(np.float32)
    db.store_embeddings_batch(
        list(range(256)), list(mat),
        [{"grp": int(i % 4)} for i in range(256)],
    )
    errors = []
    stop = threading.Event()

    def searcher(gi):
        r = np.random.default_rng(gi)
        while not stop.is_set():
            q = r.standard_normal(d).astype(np.float32)
            try:
                ids, _, metas = db.find_most_similar(
                    q, k=5, metadata_filter={"grp": gi}
                )
                # every hit must satisfy the filter, even mid-mutation
                if any(m["grp"] != gi for m in metas):
                    errors.append(f"stale mask leak for grp {gi}")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    def writer():
        r = np.random.default_rng(99)
        uid = 10_000
        while not stop.is_set():
            try:
                db.store_embedding(
                    uid, r.standard_normal(d).astype(np.float32),
                    {"grp": int(uid % 4)},
                )
                if uid % 3 == 0:
                    db.delete_embedding(uid)
                uid += 1
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    threads = [threading.Thread(target=searcher, args=(g,)) for g in range(4)]
    threads.append(threading.Thread(target=writer))
    for t in threads:
        t.start()
    import time

    time.sleep(3.0)
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors[:5]


def test_concurrent_small_embeds_thread_safe(monkeypatch):
    from minivectordb_tpu.embedding_model import EmbeddingModel

    model = EmbeddingModel()
    enc = model.model
    monkeypatch.setattr(type(enc), "_host_capable", lambda self: True)
    texts = ["dogs are loyal", "cats are independent", "markets fell"]
    expected = [enc.embed([t])[0] for t in texts]
    errors = []

    def worker(i):
        for _ in range(20):
            try:
                out = enc.embed([texts[i % 3]])[0]
                if not np.allclose(out, expected[i % 3], rtol=1e-4, atol=1e-5):
                    errors.append("nondeterministic embed")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:5]
