"""Mesh-backed databases (multi-chip search through the public API) must
return identical results to the single-device path — 8 virtual CPU devices."""

import shutil
import uuid

import numpy as np

from minivectordb_tpu.parallel.mesh import search_mesh
from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase
from minivectordb_tpu.vector_database import VectorDatabase


def test_flat_db_with_mesh_matches_single_device():
    mesh = search_mesh(8)
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((3000, 32)).astype(np.float32)
    metas = [{"g": int(i % 5)} for i in range(3000)]

    db1 = VectorDatabase(storage_file=f"/tmp/{uuid.uuid4()}.pkl")
    dbm = VectorDatabase(storage_file=f"/tmp/{uuid.uuid4()}.pkl", mesh=mesh)
    for db in (db1, dbm):
        db.store_embeddings_batch(list(range(3000)), list(mat), list(metas))

    q = rng.standard_normal(32).astype(np.float32)
    r1 = db1.find_most_similar(q, k=7)
    rm = dbm.find_most_similar(q, k=7)
    assert list(r1[0]) == list(rm[0])
    np.testing.assert_allclose(
        np.asarray(r1[1], np.float64), np.asarray(rm[1], np.float64), rtol=1e-5
    )

    # filtered path
    r1 = db1.find_most_similar(q, metadata_filter={"g": 2}, k=9)
    rm = dbm.find_most_similar(q, metadata_filter={"g": 2}, k=9)
    assert list(r1[0]) == list(rm[0])

    # mutation invalidates + reloads the distributed buffer
    dbm.delete_embedding(int(rm[0][0]))
    db1.delete_embedding(int(r1[0][0]))
    r1 = db1.find_most_similar(q, metadata_filter={"g": 2}, k=9)
    rm = dbm.find_most_similar(q, metadata_filter={"g": 2}, k=9)
    assert list(r1[0]) == list(rm[0])


def test_sharded_db_with_mesh():
    mesh = search_mesh(8)
    folder = f"./tmp_mesh_{uuid.uuid4().hex[:8]}"
    try:
        db = ShardedVectorDatabase(
            storage_dir=folder, shard_size=100, mesh=mesh, durability="wal"
        )
        rng = np.random.default_rng(1)
        mat = rng.standard_normal((500, 16)).astype(np.float32)
        db.store_embeddings_batch(list(range(500)), list(mat))
        ids, scores, _ = db.find_most_similar(mat[123], k=3)
        assert ids[0] == 123
        assert scores[0] > 0.9999
    finally:
        shutil.rmtree(folder, ignore_errors=True)


def test_mesh_async_batch_matches_sync(tmp_path):
    """search_batch_async on a mesh database must stay pipelined (device
    arrays until .result()) and agree with the synchronous path."""
    import numpy as np

    from minivectordb_tpu.parallel.mesh import search_mesh
    from minivectordb_tpu.vector_database import VectorDatabase

    mesh = search_mesh(8)
    db = VectorDatabase(storage_file=str(tmp_path / "m.pkl"), mesh=mesh)
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((1024, 32)).astype(np.float32)
    db.store_embeddings_batch(list(range(1024)), list(mat))
    q = mat[:6] + 0.01
    sync_res = db.find_most_similar_batch(q, k=5)
    async_res = db.find_most_similar_batch_async(q, k=5).result()
    for s, a in zip(sync_res, async_res):
        assert list(s[0]) == list(a[0])
        np.testing.assert_allclose(
            np.asarray(s[1], np.float32), np.asarray(a[1], np.float32),
            rtol=1e-5, atol=1e-6,
        )
