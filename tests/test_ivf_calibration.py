"""Recall-targeted nprobe auto-calibration (FAISS-autotune-style): the
engine measures probe recall@k against its own exact scan and installs the
smallest power-of-two nprobe meeting the target. The reference has no ANN
index; this keeps the beyond-reference IVF honest under corpus evolution."""

import uuid

import numpy as np
import pytest

from minivectordb_tpu.vector_database import VectorDatabase


def _tmpfile():
    return f"/tmp/ivf_cal_{uuid.uuid4().hex}.pkl"


def _clustered(n, d=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((24, d)).astype(np.float32) * 4
    mat = (
        centers[rng.integers(0, 24, n)]
        + rng.standard_normal((n, d)).astype(np.float32)
    )
    return mat.astype(np.float32)


def _mk_ivf_db(n=3000, seed=0, **opts):
    mat = _clustered(n, seed=seed)
    db = VectorDatabase(
        _tmpfile(),
        index="ivf",
        ivf_opts={
            "build_threshold": 64,
            "nlist": 16,
            "nprobe": 1,
            "iters": 5,
            **opts,
        },
    )
    db.store_embeddings_batch(list(range(n)), mat)
    return db, mat


def test_calibration_reaches_target_and_installs_nprobe():
    db, mat = _mk_ivf_db()
    # hard queries: pure Gaussians land between clusters, so nprobe=1 loses
    hard = np.random.default_rng(5).standard_normal((32, 32)).astype(
        np.float32
    )
    res = db.calibrate_nprobe(0.97, queries=hard)
    assert res["recall"] >= 0.97
    assert db.nprobe == res["nprobe"]
    probes = [e["nprobe"] for e in res["evaluated"]]
    assert probes == sorted(set(probes))  # strictly rising ladder
    assert res["nprobe"] > 1  # nprobe=1 cannot hit 0.97 on hard queries
    # the installed default actually serves queries
    ids, scores, _ = db.find_most_similar(mat[3], k=5)
    assert ids[0] == 3


def test_auto_calibration_runs_on_build():
    # heavily overlapping clusters: corpus-row neighbors scatter across
    # lists, so nprobe=1 cannot reach the target and calibration must move it
    rng = np.random.default_rng(3)
    mat = (
        rng.standard_normal((24, 32))[rng.integers(0, 24, 3000)]
        + rng.standard_normal((3000, 32))
    ).astype(np.float32)
    db = VectorDatabase(
        _tmpfile(),
        index="ivf",
        ivf_opts={"build_threshold": 64, "nlist": 16, "nprobe": 1,
                  "iters": 5, "recall_target": 0.99},
    )
    db.store_embeddings_batch(list(range(3000)), mat)
    db.find_most_similar(mat[0], k=5)  # triggers lazy build + calibration
    assert db.nprobe > 1  # auto-calibration replaced the configured nprobe=1
    snap = db._engine.telemetry.snapshot()
    assert snap.get("nprobe_calibration", {}).get("count", 0) == 1


def test_full_probe_target_caps_at_nlist():
    db, _ = _mk_ivf_db()
    res = db.calibrate_nprobe(1.0)
    nlist = int(db._engine._ivf.centroids.shape[0])
    assert res["nprobe"] <= nlist
    assert res["evaluated"][-1]["nprobe"] == res["nprobe"]


def test_calibration_error_cases():
    flat = VectorDatabase(_tmpfile())
    flat.store_embedding(1, np.ones(8, np.float32))
    with pytest.raises(ValueError, match="index='ivf'"):
        flat.calibrate_nprobe(0.9)

    empty = VectorDatabase(_tmpfile(), index="ivf")
    with pytest.raises(ValueError, match="empty"):
        empty.calibrate_nprobe(0.9)

    db, _ = _mk_ivf_db()
    with pytest.raises(ValueError, match="recall_target"):
        db.calibrate_nprobe(0.0)

    small = VectorDatabase(
        _tmpfile(), index="ivf", ivf_opts={"build_threshold": 1000}
    )
    small.store_embeddings_batch(
        list(range(10)), np.eye(10, 16, dtype=np.float32)
    )
    with pytest.raises(ValueError, match="build_threshold"):
        small.calibrate_nprobe(0.9)


def test_calibration_on_mesh_database():
    import jax

    from minivectordb_tpu.parallel.mesh import search_mesh

    mesh = search_mesh(len(jax.devices()))
    mat = _clustered(4000, seed=2)
    db = VectorDatabase(
        _tmpfile(),
        index="ivf",
        mesh=mesh,
        ivf_opts={"build_threshold": 64, "nlist": 16, "nprobe": 1,
                  "iters": 5},
    )
    db.store_embeddings_batch(list(range(4000)), mat)
    res = db.calibrate_nprobe(0.95)
    assert res["recall"] >= 0.95
    assert db.nprobe == res["nprobe"]
    ids, _, _ = db.find_most_similar(mat[11], k=5)
    assert ids[0] == 11


def test_calibrated_nprobe_survives_persist_reload():
    db, mat = _mk_ivf_db(seed=6)
    hard = np.random.default_rng(8).standard_normal((32, 32)).astype(
        np.float32
    )
    res = db.calibrate_nprobe(0.97, queries=hard)
    assert res["nprobe"] > 1
    db.persist_to_disk()
    db2 = VectorDatabase(db.storage_file, index="ivf",
                         ivf_opts={"build_threshold": 64})
    db2.find_most_similar(mat[0], k=5)  # reattaches the persisted layout
    assert db2.nprobe == res["nprobe"]


def test_manual_calibration_survives_rebuild_and_reload():
    """A manually calibrated nprobe must keep persisting after the index
    REBUILDS (fresh IVFIndex objects are stamped with the engine's
    calibration flag before their state dict is captured)."""
    db, mat = _mk_ivf_db(n=1500, seed=9, rebuild_floor=8, rebuild_frac=0.2)
    hard = np.random.default_rng(10).standard_normal((32, 32)).astype(
        np.float32
    )
    res = db.calibrate_nprobe(0.97, queries=hard)
    assert res["nprobe"] > 1
    # grow past the rebuild policy and trigger the rebuild via a search
    extra = _clustered(600, seed=11)
    db.store_embeddings_batch(
        [10_000 + i for i in range(600)], extra
    )
    db.find_most_similar(mat[0], k=5)
    assert db.nprobe == res["nprobe"]  # value survives the rebuild
    db.persist_to_disk()
    db2 = VectorDatabase(db.storage_file, index="ivf",
                         ivf_opts={"build_threshold": 64})
    db2.find_most_similar(mat[0], k=5)  # reattach
    assert db2.nprobe == res["nprobe"]


def test_calibration_with_overflow_only_truth_keeps_nprobe():
    """Queries whose exact neighbors all live in the post-build overflow:
    the probe has nothing it could miss (the live path scans overflow
    exactly), so calibration reports recall 1.0 and leaves nprobe alone
    instead of installing the maximum."""
    db, mat = _mk_ivf_db(n=300, seed=12, nprobe=2)
    db.find_most_similar(mat[0], k=1)  # build NOW, so later rows overflow
    base = np.zeros(32, dtype=np.float32)
    base[31] = 5.0
    rng = np.random.default_rng(13)
    over = base + 0.01 * rng.standard_normal((50, 32)).astype(np.float32)
    db.store_embeddings_batch(
        [50_000 + i for i in range(50)], over.astype(np.float32)
    )
    q = np.tile(base, (4, 1)).astype(np.float32)
    before = db.nprobe
    res = db.calibrate_nprobe(0.99, queries=q)
    assert res["recall"] == 1.0
    assert res["evaluated"] == []
    assert db.nprobe == before


def test_partial_shortfall_reruns_only_short_rows_correctly():
    """A filtered batch where some queries probe the right list and one
    probes an ineligible one: every row still returns exactly
    min(k, candidates) eligible hits matching the oracle."""
    rng = np.random.default_rng(14)
    centers = rng.standard_normal((16, 32)).astype(np.float32) * 8
    labels = rng.integers(0, 16, 4000)
    mat = (centers[labels] + 0.3 * rng.standard_normal((4000, 32))).astype(
        np.float32
    )
    db = VectorDatabase(
        _tmpfile(),
        index="ivf",
        ivf_opts={"build_threshold": 64, "nlist": 16, "nprobe": 1,
                  "iters": 6, "filtered_min_frac": 0.0001},
    )
    db.store_embeddings_batch(
        list(range(4000)), mat,
        [{"c": int(labels[i])} for i in range(4000)],
    )
    eligible = labels == 0
    # q0 aims at cluster 0 (probe can succeed); q1 aims at cluster 5
    # (probed list holds no eligible rows -> shortfall -> exact rerun)
    qs = np.stack([centers[0], centers[5]]).astype(np.float32)
    res = db.find_most_similar_batch(qs, k=10, metadata_filter={"c": 0})
    for b in range(2):
        ids, scores, metas = res[b]
        assert len(ids) == 10  # count contract for BOTH rows
        assert all(m["c"] == 0 for m in metas)
    # the short row (q1: its single probed list holds no eligible rows)
    # came from the exact rerun, so it matches the oracle exactly; the
    # probe-served row is only count/eligibility-guaranteed (ANN recall)
    assert set(res[1][0]) == set(
        _oracle_topk_eligible(mat, qs[1], 10, eligible)
    )


def _oracle_topk_eligible(mat, q, k, eligible):
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / np.linalg.norm(mat, axis=1)
    scores = np.where(eligible, scores, -np.inf)
    order = np.argsort(-scores)
    return [int(r) for r in order[:k] if np.isfinite(scores[r])]
