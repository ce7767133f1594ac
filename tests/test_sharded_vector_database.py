"""ShardedVectorDatabase suite (ported from reference
tests/test_sharded_vector_database.py via the shared suite)."""

from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

from _sharded_suite import ShardedSuite


class TestShardedVectorDatabase(ShardedSuite):
    db_cls = ShardedVectorDatabase
    lower_is_better = False


def test_shard_dir_stays_loadable_by_the_reference_loader():
    """The reference's directory loader filters '*.pkl' and int()-parses
    each name as shard_<N>.pkl (reference sharded_vector_database.py:45-46)
    — any stray .pkl we write (WAL, IVF sidecar, temp files) would CRASH a
    reference process pointed at the same directory. Assert every file our
    richest configuration writes is either a well-formed shard pickle or
    not a .pkl at all."""
    import os
    import re
    import uuid

    import numpy as np

    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

    folder = f"/tmp/refload_{uuid.uuid4().hex}"
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    db = ShardedVectorDatabase(
        storage_dir=folder, shard_size=50, durability="wal", index="ivf",
        ivf_opts={"build_threshold": 64, "nlist": 4, "nprobe": 64,
                  "iters": 3},
    )
    db.store_embeddings_batch(list(range(300)), mat)
    db.find_most_similar(mat[1], k=3)  # IVF build -> sidecar write
    db.delete_embeddings_batch([5])
    db.compact()
    for name in os.listdir(folder):
        if name.endswith(".pkl"):
            m = re.fullmatch(r"shard_(\d+)\.pkl", name)
            assert m, f"stray .pkl would crash the reference loader: {name}"
            int(name.split("_")[1].split(".")[0])  # the reference's parse
