"""ShardedVectorDatabaseUsearch suite (ported from reference
tests/test_sharded_vector_database_usearch.py via the shared suite — the
reference file mirrors the sharded suite with only setup/class-name changes).
"""

from minivectordb_tpu.sharded_vector_database_usearch import (
    ShardedVectorDatabaseUsearch,
)

from _sharded_suite import ShardedSuite


class TestShardedVectorDatabaseUsearch(ShardedSuite):
    db_cls = ShardedVectorDatabaseUsearch
    lower_is_better = True

    def test_distances_are_lower_is_better(self):
        import numpy as np

        from _sharded_suite import temp_dir_db

        with temp_dir_db(self.db_cls) as folder:
            db = self.make(folder)
            db.store_embedding(1, [1.0, 0.0])
            db.store_embedding(2, [0.0, 1.0])
            ids, distances, _ = db.find_most_similar([1.0, 0.1], k=2)
            assert ids[0] == 1
            # cosine distance: best match near 0, orthogonal-ish near 1
            assert distances[0] < 0.1
            assert distances[1] > 0.5
