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


def test_int8_recall_vs_f32_oracle_random_corpus(tmp_path):
    """The int8-quantized scan (the usearch stand-in) on random Gaussians:
    recall@10 vs the float32 oracle must stay high — int8 cosine noise on
    384-d unit vectors is ~1e-2, far under typical neighbor gaps — and
    distances must be ascending and within quantization tolerance."""
    import numpy as np

    from minivectordb_tpu.sharded_vector_database_usearch import (
        ShardedVectorDatabaseUsearch,
    )

    rng = np.random.default_rng(11)
    n, d, k = 3000, 64, 10
    mat = rng.standard_normal((n, d)).astype(np.float32)
    db = ShardedVectorDatabaseUsearch(
        storage_dir=str(tmp_path / "u8"), shard_size=1024
    )
    db.store_embeddings_batch([f"u{i}" for i in range(n)], list(mat))
    hits = total = 0
    for qi in range(32):
        q = rng.standard_normal(d).astype(np.float32)
        ids, dists, _ = db.find_most_similar(q, k=k)
        assert all(dists[i] <= dists[i + 1] + 1e-6 for i in range(len(dists) - 1))
        qn = q / np.linalg.norm(q)
        sims = (mat @ qn) / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        oracle = {f"u{r}" for r in np.argsort(-sims)[:k]}
        got = set(ids)
        hits += len(got & oracle)
        total += k
        # distance of the true top-1 must be within int8 tolerance
        top1 = int(np.argmax(sims))
        if f"u{top1}" in got:
            want = 1.0 - float(sims[top1])
            have = float(dists[list(ids).index(f"u{top1}")])
            assert abs(have - want) < 0.05
    assert hits / total >= 0.9, hits / total
