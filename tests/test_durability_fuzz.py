"""Durability fuzz: any random op interleaving, persisted and reloaded,
must reproduce the exact live corpus.

Covers both sharded durability modes ('shard' write-through pickles like the
reference, 'wal' append-log) plus the flat database's pickle, with searches
after reload compared against a dict oracle — the invariant the reference's
own multithreaded persistence tests print-but-never-assert
(reference tests/test_sharded_multithreaded_operations.py:101-103).
"""

import random

import numpy as np
import pytest

from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase
from minivectordb_tpu.vector_database import VectorDatabase

D = 12


def _run_ops(db, rng, nprng, live, n_steps=120):
    next_id = [max([int(u[1:]) for u in live], default=0) + 1]

    def fresh_uid():
        u = f"u{next_id[0]}"
        next_id[0] += 1
        return u

    for _ in range(n_steps):
        op = rng.random()
        if op < 0.5 or len(live) < 3:
            u = fresh_uid()
            v = nprng.standard_normal(D).astype(np.float32)
            db.store_embedding(u, v, {"n": int(u[1:])})
            live[u] = v
        elif op < 0.65:
            n = rng.choice([2, 6])
            us = [fresh_uid() for _ in range(n)]
            vs = nprng.standard_normal((n, D)).astype(np.float32)
            db.store_embeddings_batch(us, list(vs),
                                      [{"n": int(u[1:])} for u in us])
            live.update(zip(us, vs))
        elif len(live) > 3:
            doomed = rng.sample(sorted(live), rng.choice([1, 3]))
            db.delete_embeddings_batch(doomed)
            for u in doomed:
                del live[u]


def _check_matches_oracle(db, live, nprng):
    q = nprng.standard_normal(D).astype(np.float32)
    k = min(10, len(live))
    ids, scores, _ = db.find_most_similar(q, k=k)
    mat_ids = sorted(live)
    mat = np.stack([live[u] for u in mat_ids])
    qn = q / np.linalg.norm(q)
    s = (mat @ qn) / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    want = [mat_ids[i] for i in np.argsort(-s)[:k]]
    assert list(ids) == want


@pytest.mark.parametrize("durability", ["shard", "wal"])
def test_sharded_random_ops_survive_reload(tmp_path, durability):
    rng = random.Random(7)
    nprng = np.random.default_rng(7)
    sdir = str(tmp_path / durability)
    db = ShardedVectorDatabase(storage_dir=sdir, shard_size=16,
                               durability=durability)
    live = {}
    _run_ops(db, rng, nprng, live)
    _check_matches_oracle(db, live, nprng)
    del db

    re = ShardedVectorDatabase(storage_dir=sdir, shard_size=16,
                               durability=durability)
    assert sorted(re.unique_ids) == sorted(live)
    for u in rng.sample(sorted(live), 10):
        np.testing.assert_allclose(
            np.asarray(re.get_vector(u), np.float32), live[u],
            rtol=1e-6, atol=1e-7,
        )
    _check_matches_oracle(re, live, nprng)
    # second generation of mutations on the reloaded instance, reload again
    _run_ops(re, rng, nprng, live, n_steps=40)
    del re
    re2 = ShardedVectorDatabase(storage_dir=sdir, shard_size=16,
                                durability=durability)
    assert sorted(re2.unique_ids) == sorted(live)
    _check_matches_oracle(re2, live, nprng)


def test_flat_random_ops_survive_reload(tmp_path):
    rng = random.Random(9)
    nprng = np.random.default_rng(9)
    path = str(tmp_path / "flat.pkl")
    db = VectorDatabase(storage_file=path)
    live = {}
    next_id = [1]
    for _ in range(150):
        op = rng.random()
        if op < 0.6 or len(live) < 3:
            u = next_id[0]
            next_id[0] += 1
            v = nprng.standard_normal(D).astype(np.float32)
            db.store_embedding(u, v, {"n": u})
            live[u] = v
        elif len(live) > 3:
            doomed = rng.sample(sorted(live), 1)[0]
            db.delete_embedding(doomed)
            del live[doomed]
    db.persist_to_disk()
    re = VectorDatabase(storage_file=path)
    # reference schema: id_map is row->uid, inverse_id_map is uid->row
    assert sorted(re.inverse_id_map) == sorted(live)
    q = nprng.standard_normal(D).astype(np.float32)
    ids, _, _ = re.find_most_similar(q, k=5)
    mat_ids = sorted(live)
    mat = np.stack([live[u] for u in mat_ids])
    qn = q / np.linalg.norm(q)
    s = (mat @ qn) / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    want = [mat_ids[i] for i in np.argsort(-s)[:5]]
    assert list(ids) == want
