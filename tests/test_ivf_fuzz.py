"""Stateful fuzz of the IVF database lifecycle.

Random interleavings of store / store_batch / delete / search drive the
hairiest state machine in the engine — lazy build, overflow side-buffer,
tombstone+remap deletes, rebuild policy, rescore-corpus refresh — and every
search runs with a huge per-call nprobe override (clamped to the EFFECTIVE
centroid count, which the build may adapt above/below the configured nlist
by splitting big or dropping empty clusters) so probing is exhaustive and
the answer must match a brute-force numpy oracle over the live corpus
exactly, regardless of which internal state (pre-build scan,
index+overflow merge, post-rebuild) served it.
"""

import random
import uuid

import numpy as np
import pytest

from minivectordb_tpu.vector_database import VectorDatabase

D = 16
NLIST = 8


def _oracle_topk(live, q, k):
    ids = list(live.keys())
    mat = np.stack([live[i] for i in ids])
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    order = np.argsort(-scores)[: min(k, len(ids))]
    return [ids[i] for i in order], scores[order]


@pytest.mark.parametrize("seed", [5, 17])
def test_ivf_lifecycle_fuzz_matches_exact_oracle(tmp_path, seed):
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    db = VectorDatabase(
        storage_file=str(tmp_path / f"{uuid.uuid4()}.pkl"), index="ivf",
        ivf_opts={
            "build_threshold": 64, "nlist": NLIST, "nprobe": NLIST,
            "iters": 4, "rebuild_frac": 0.3, "rebuild_floor": 16,
        },
    )
    live = {}
    next_id = 0
    searches = 0
    for step in range(400):
        if step in (150, 300):
            # persist + reload mid-churn: the trained IVF layout rides in
            # the pickle and must reattach without a k-means re-run
            db.persist_to_disk()
            path = db.storage_file
            del db
            db = VectorDatabase(
                storage_file=path, index="ivf",
                ivf_opts={
                    "build_threshold": 64, "nlist": NLIST, "nprobe": NLIST,
                    "iters": 4, "rebuild_frac": 0.3, "rebuild_floor": 16,
                },
            )
            assert sorted(db.inverse_id_map) == sorted(live)
        op = rng.random()
        if op < 0.45 or len(live) < 4:
            v = nprng.standard_normal(D).astype(np.float32)
            db.store_embedding(next_id, v, {"s": step})
            live[next_id] = v
            next_id += 1
        elif op < 0.55:
            n = rng.choice([4, 16, 40])
            vs = nprng.standard_normal((n, D)).astype(np.float32)
            ids = list(range(next_id, next_id + n))
            db.store_embeddings_batch(ids, list(vs))
            live.update(zip(ids, vs))
            next_id += n
        elif op < 0.75 and len(live) > 4:
            doomed = rng.sample(sorted(live), rng.choice([1, 2, 5]))
            for uid in doomed:
                db.delete_embedding(uid)
                del live[uid]
        else:
            k = rng.choice([1, 3, 10])
            q = nprng.standard_normal(D).astype(np.float32)
            ids, scores, _ = db.find_most_similar(q, k=k, nprobe=1_000_000)
            want_ids, want_scores = _oracle_topk(live, q, k)
            assert list(ids) == want_ids, (
                f"seed {seed} step {step}: corpus {len(live)}, k {k}\n"
                f"got  {list(ids)}\nwant {want_ids}"
            )
            np.testing.assert_allclose(
                np.asarray(scores, np.float32), want_scores,
                rtol=1e-4, atol=1e-5,
            )
            searches += 1
    assert searches > 50
    # the run must actually have passed through the built-index regime
    assert db._engine._ivf is not None or len(live) < 64
