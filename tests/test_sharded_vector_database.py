"""ShardedVectorDatabase suite (ported from reference
tests/test_sharded_vector_database.py via the shared suite)."""

from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase

from _sharded_suite import ShardedSuite


class TestShardedVectorDatabase(ShardedSuite):
    db_cls = ShardedVectorDatabase
    lower_is_better = False
