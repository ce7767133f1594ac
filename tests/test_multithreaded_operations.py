"""Concurrent insert/search/delete against one flat db (ported from
reference tests/test_multithreaded_operations.py with the same exact-count
assertions; sizes scaled to CI-friendly levels — the reference's own sizes
run in bench/stress, not unit tests)."""

import threading
import time
import uuid

import numpy as np

from minivectordb_tpu.vector_database import VectorDatabase


def test_multithreaded_simultaneous_operations():
    db = VectorDatabase()
    embedding_size = 64
    initial_size = 1000
    n_insert, n_search, del_range = 400, 200, (100, 800)

    unique_ids = [i for i in range(initial_size)]
    embeddings = [np.random.rand(embedding_size) for _ in range(initial_size)]
    metadata_dicts = [{"num_filter": f"test_{i}"} for i in range(initial_size)]
    db.store_embeddings_batch(unique_ids, embeddings, metadata_dicts)

    def index_thread():
        for i in range(n_insert):
            emb_id = str(uuid.uuid4())
            db.store_embedding(
                f"item_{emb_id}",
                np.random.rand(embedding_size),
                metadata_dict={"num_filter": f"test_{i}"},
            )

    def search_thread():
        for _ in range(n_search):
            db.find_most_similar(embedding=np.random.rand(embedding_size), k=3)

    def delete_thread():
        for i in range(*del_range):
            db.delete_embedding(i)

    threads = []
    for _ in range(5):
        threads.append(threading.Thread(target=index_thread))
        threads.append(threading.Thread(target=search_thread))
    threads.append(threading.Thread(target=delete_thread))

    start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - start
    total_ops = 5 * n_insert + 5 * n_search + (del_range[1] - del_range[0])
    print(f"Time taken for multithreaded operations: {elapsed} "
          f"({total_ops / elapsed:.0f} ops/sec)")

    expected = initial_size + 5 * n_insert - (del_range[1] - del_range[0])
    assert len(db.id_map) == expected
    assert len(db.inverse_id_map) == expected
    assert len(db.metadata) == expected
    assert len(db.embeddings) == expected
