"""WAL fast-ingest mode: durability semantics, crash recovery, compaction,
and parity with the reference-compatible 'shard' mode."""

import os
import pickle
import shutil
import uuid

import numpy as np
import pytest

from minivectordb_tpu.core import wal as wal_mod
from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase


def _tmp():
    return f"./tmp_wal_{uuid.uuid4().hex[:8]}"


def test_wal_record_roundtrip_and_torn_tail():
    folder = _tmp()
    os.makedirs(folder)
    try:
        path = os.path.join(folder, "wal.log")
        wal_mod.append_record(path, ("add", 1, np.ones(4, np.float32), {"a": 1}))
        wal_mod.append_record(path, ("del", [1]))
        # simulate a torn write: append garbage tail
        with open(path, "ab") as f:
            f.write(b"\x4d\x56\x44\x57partial-garbage")
        ops = wal_mod.read_records(path)
        assert len(ops) == 2
        assert ops[0][0] == "add" and ops[0][1] == 1
        assert ops[1] == ("del", [1])
    finally:
        shutil.rmtree(folder, ignore_errors=True)


def test_wal_mode_survives_reload_without_compact():
    folder = _tmp()
    try:
        db = ShardedVectorDatabase(storage_dir=folder, shard_size=3,
                                   durability="wal")
        rng = np.random.default_rng(0)
        vecs = {i: rng.random(8).astype(np.float32) for i in range(10)}
        for i, v in vecs.items():
            db.store_embedding(i, v, {"i": i})
        db.delete_embeddings_batch([2, 5])
        # crash simulation: NO compact() — a fresh instance must replay WAL
        db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=3,
                                    durability="wal")
        assert sorted(db2.inverse_id_map) == [0, 1, 3, 4, 6, 7, 8, 9]
        for i in db2.inverse_id_map:
            np.testing.assert_array_equal(db2.get_vector(i), vecs[i])
        # replay auto-compacted: WAL gone, shard files authoritative
        assert not os.path.exists(os.path.join(folder, "wal.log"))
        db3 = ShardedVectorDatabase(storage_dir=folder, shard_size=3)
        assert sorted(db3.inverse_id_map) == [0, 1, 3, 4, 6, 7, 8, 9]
    finally:
        shutil.rmtree(folder, ignore_errors=True)


def test_wal_compact_produces_reference_schema_shards():
    folder = _tmp()
    try:
        db = ShardedVectorDatabase(storage_dir=folder, shard_size=2,
                                   durability="wal")
        db.store_embeddings_batch(
            ["a", "b", "c"], list(np.eye(3, dtype=np.float32)),
            [{"k": "v"}, {}, {}],
        )
        db.compact()
        files = sorted(f for f in os.listdir(folder) if f.endswith(".pkl"))
        assert files == ["shard_0.pkl", "shard_1.pkl"]
        with open(os.path.join(folder, "shard_0.pkl"), "rb") as f:
            data = pickle.load(f)
        assert set(data.keys()) == {
            "embeddings", "metadata", "unique_ids", "inverted_index"
        }
        assert data["unique_ids"] == ["a", "b"]
        # compacted dirs load in default (reference) mode
        db2 = ShardedVectorDatabase(storage_dir=folder, shard_size=2)
        assert sorted(db2.inverse_id_map) == ["a", "b", "c"]
    finally:
        shutil.rmtree(folder, ignore_errors=True)


def test_wal_mode_search_identical_to_shard_mode():
    f1, f2 = _tmp(), _tmp()
    try:
        rng = np.random.default_rng(1)
        mat = rng.standard_normal((50, 16)).astype(np.float32)
        dbs = [
            ShardedVectorDatabase(storage_dir=f1, shard_size=7),
            ShardedVectorDatabase(storage_dir=f2, shard_size=7,
                                  durability="wal"),
        ]
        for db in dbs:
            db.store_embeddings_batch(
                list(range(50)), list(mat), [{"p": i % 3} for i in range(50)]
            )
            db.delete_embeddings_batch([3, 14])
        q = rng.standard_normal(16).astype(np.float32)
        res = [
            db.find_most_similar(q, metadata_filter={"p": 1}, k=5) for db in dbs
        ]
        assert list(res[0][0]) == list(res[1][0])
        np.testing.assert_allclose(
            np.asarray(res[0][1], np.float64), np.asarray(res[1][1], np.float64),
            rtol=1e-6,
        )
    finally:
        shutil.rmtree(f1, ignore_errors=True)
        shutil.rmtree(f2, ignore_errors=True)


def test_invalid_durability_mode():
    with pytest.raises(ValueError):
        ShardedVectorDatabase(storage_dir=_tmp(), durability="bogus")
