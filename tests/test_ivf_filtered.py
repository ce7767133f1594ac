"""Broad metadata filters ride the IVF probe (overfetched, device-masked
candidate stage) instead of forfeiting to the exact masked scan; selective
filters and async dispatches keep the exact path; a probe that comes up
short of search_k eligible hits falls back to the exact scan, preserving the
reference's exact-count contract (reference vector_database.py:489-492)."""

import uuid

import numpy as np

from minivectordb_tpu.vector_database import VectorDatabase


def _tmpfile():
    return f"/tmp/ivf_filt_{uuid.uuid4().hex}.pkl"


def _mk_db(n, d=32, seed=0, **opts):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((16, d)).astype(np.float32) * 4
    labels = rng.integers(0, 16, n)
    mat = (centers[labels] + rng.standard_normal((n, d))).astype(np.float32)
    db = VectorDatabase(
        _tmpfile(),
        index="ivf",
        ivf_opts={
            "build_threshold": 64,
            "nlist": 8,
            "nprobe": 64,  # >= effective nlist -> exhaustive probe
            "iters": 4,
            **opts,
        },
    )
    metas = [{"i": int(i), "cluster": int(labels[i])} for i in range(n)]
    db.store_embeddings_batch(list(range(n)), mat, metas)
    return db, mat, labels


def _oracle(mat, q, k, eligible):
    qn = q / np.linalg.norm(q)
    scores = (mat @ qn) / np.linalg.norm(mat, axis=1)
    scores = np.where(eligible, scores, -np.inf)
    order = np.argsort(-scores)
    return [int(r) for r in order[:k] if np.isfinite(scores[r])]


def _counts(db):
    snap = db._engine.telemetry.snapshot()
    return (
        snap.get("ivf_scan", {}).get("count", 0),
        snap.get("device_scan", {}).get("count", 0),
    )


def test_broad_filter_rides_ivf_and_matches_oracle():
    """A filter passing all but 3 rows: the top-10 eligible set is provably
    inside the overfetched candidate window at exhaustive probe, so the
    masked IVF result equals the exact oracle."""
    db, mat, _ = _mk_db(2000)
    excl = [{"i": 5}, {"i": 77}, {"i": 300}]
    eligible = np.ones(len(mat), dtype=bool)
    eligible[[5, 77, 300]] = False
    rng = np.random.default_rng(42)
    for q in rng.standard_normal((6, mat.shape[1])).astype(np.float32):
        ids, scores, metas = db.find_most_similar(q, k=10, exclude_filter=excl)
        assert len(ids) == 10
        assert set(ids) == set(_oracle(mat, q, 10, eligible))
        assert all(m["i"] not in (5, 77, 300) for m in metas)
    ivf_n, exact_n = _counts(db)
    assert ivf_n >= 6 and exact_n == 0  # served by the probe, no fallback


def test_bf16_filtered_probe_recall_and_count():
    db, mat, labels = _mk_db(4000, seed=1)
    filt = {"cluster": {"$lte": 11}}  # ~75% of rows pass
    eligible = labels <= 11
    rng = np.random.default_rng(7)
    hits = want = 0
    for q in rng.standard_normal((20, mat.shape[1])).astype(np.float32):
        ids, scores, metas = db.find_most_similar(
            q, k=10, metadata_filter=filt
        )
        assert len(ids) == 10  # exact-count contract under the filter
        assert all(m["cluster"] <= 11 for m in metas)
        oracle = set(_oracle(mat, q, 10, eligible))
        hits += len(set(ids) & oracle)
        want += 10
    assert hits / want >= 0.95


def test_shortfall_falls_back_to_exact_scan():
    """nprobe=1 against a 10-row filter: the single probed list cannot hold
    search_k eligible rows, so the engine reruns exact and still returns
    exactly min(k, n_candidates) hits."""
    db, mat, _ = _mk_db(
        4000, seed=2, nprobe=1, filtered_min_frac=0.001
    )
    filt = {"i": {"$gte": 3990}}
    eligible = np.arange(len(mat)) >= 3990
    q = np.asarray(mat[100], dtype=np.float32)
    ids, scores, metas = db.find_most_similar(q, k=10, metadata_filter=filt)
    assert len(ids) == 10
    assert set(ids) == set(_oracle(mat, q, 10, eligible))
    ivf_n, exact_n = _counts(db)
    assert ivf_n >= 1 and exact_n >= 1  # probe ran, then the fallback


def test_selective_filter_keeps_exact_path():
    db, mat, _ = _mk_db(2000, seed=3)
    filt = {"i": {"$lt": 200}}  # 10% < filtered_min_frac 0.5
    eligible = np.arange(len(mat)) < 200
    q = np.asarray(mat[10], dtype=np.float32)
    ids, scores, metas = db.find_most_similar(q, k=10, metadata_filter=filt)
    assert set(ids) == set(_oracle(mat, q, 10, eligible))
    ivf_n, exact_n = _counts(db)
    assert ivf_n == 0 and exact_n >= 1


def test_async_filtered_search_stays_exact():
    db, mat, _ = _mk_db(2000, seed=4)
    eligible = np.ones(len(mat), dtype=bool)
    eligible[[1, 2]] = False
    pending = db.find_most_similar_batch_async(
        mat[:4], k=10, exclude_filter=[{"i": 1}, {"i": 2}]
    )
    results = pending.result()
    for b in range(4):
        ids = results[b][0]
        assert set(ids) == set(_oracle(mat, mat[b], 10, eligible))
    ivf_n, exact_n = _counts(db)
    assert ivf_n == 0  # fetch=False dispatches never probe filtered


def test_filtered_probe_merges_masked_overflow():
    """Post-build overflow rows obey the filter too: an eligible overflow
    row identical to the query ranks first; an ineligible identical row
    never appears."""
    db, mat, _ = _mk_db(2000, seed=5)
    q = np.asarray(
        np.random.default_rng(9).standard_normal(mat.shape[1]),
        dtype=np.float32,
    )
    db.store_embedding(100000, q, {"i": 100000, "cluster": 99})
    db.store_embedding(100001, q * 1.0001, {"i": 100001, "cluster": 99})
    ids, scores, metas = db.find_most_similar(
        q, k=5, exclude_filter={"i": 100001}
    )
    assert ids[0] == 100000
    assert 100001 not in ids
    ivf_n, exact_n = _counts(db)
    assert ivf_n >= 1


def _mk_mesh_db(n=4000, seed=20, **opts):
    import jax

    from minivectordb_tpu.parallel.mesh import search_mesh

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((16, 32)).astype(np.float32) * 4
    labels = rng.integers(0, 16, n)
    mat = (centers[labels] + rng.standard_normal((n, 32))).astype(np.float32)
    db = VectorDatabase(
        _tmpfile(),
        index="ivf",
        mesh=search_mesh(len(jax.devices())),
        ivf_opts={"build_threshold": 64, "nlist": 16, "nprobe": 64,
                  "iters": 4, **opts},
    )
    metas = [{"i": int(i), "cluster": int(labels[i])} for i in range(n)]
    db.store_embeddings_batch(list(range(n)), mat, metas)
    return db, mat, labels


def test_mesh_broad_filter_rides_ivf():
    db, mat, labels = _mk_mesh_db()
    filt = {"cluster": {"$lte": 11}}  # ~75% pass
    eligible = labels <= 11
    rng = np.random.default_rng(21)
    hits = want = 0
    for q in rng.standard_normal((12, mat.shape[1])).astype(np.float32):
        ids, scores, metas = db.find_most_similar(
            q, k=10, metadata_filter=filt
        )
        assert len(ids) == 10
        assert all(m["cluster"] <= 11 for m in metas)
        hits += len(set(ids) & set(_oracle(mat, q, 10, eligible)))
        want += 10
    assert hits / want >= 0.95
    ivf_n, _ = _counts(db)
    assert ivf_n >= 12


def test_mesh_shortfall_falls_back_to_exact():
    db, mat, _ = _mk_mesh_db(nprobe=1, filtered_min_frac=0.001)
    filt = {"i": {"$gte": 3990}}
    eligible = np.arange(len(mat)) >= 3990
    q = np.asarray(mat[50], dtype=np.float32)
    ids, scores, metas = db.find_most_similar(q, k=10, metadata_filter=filt)
    assert len(ids) == 10
    assert set(ids) == set(_oracle(mat, q, 10, eligible))
    ivf_n, exact_n = _counts(db)
    assert ivf_n >= 1 and exact_n >= 1


def test_filtered_probe_races_deleter_without_corruption():
    """Filtered IVF searches (shortfall fallback included) racing a deleting
    writer: the splice identity guard must force a consistent full rerun
    when the row space moves, so every result row is well-formed — correct
    count or fewer, filter respected, and (uid -> metadata) pairs that
    actually belong together."""
    import threading

    db, mat, labels = _mk_db(4000, seed=30, nprobe=1,
                             filtered_min_frac=0.0001)
    db.find_most_similar(mat[0], k=1)  # build now
    filt = {"cluster": {"$lte": 7}}
    errors = []
    stop = threading.Event()

    def deleter():
        try:
            for uid in range(3999, 3599, -4):
                db.delete_embedding(uid)
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def searcher():
        rng = np.random.default_rng(31)
        try:
            while not stop.is_set():
                q = rng.standard_normal(mat.shape[1]).astype(np.float32)
                ids, scores, metas = db.find_most_similar(
                    q, k=10, metadata_filter=filt
                )
                assert len(ids) == len(metas) <= 10
                for uid, m in zip(ids, metas):
                    assert m["cluster"] <= 7
                    # uid->metadata alignment: the stored metadata carries
                    # its own uid in "i"
                    assert m["i"] == uid
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=deleter)] + [
        threading.Thread(target=searcher) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


import pytest


@pytest.mark.parametrize("seed", [5, 17])
def test_filtered_ivf_end_to_end_matches_oracle_fuzz(tmp_path, seed,
                                                     monkeypatch):
    """Randomized end-to-end equality: with the overfetch forced to full
    width, the masked probe is provably exact, so every random filter /
    overflow / delete combination must return EXACTLY the oracle's top-k of
    the eligible live rows — this fuzzes the mask upload+gather, the
    sentinel select, the masked overflow merge and the count guarantee as
    one pipeline (the overfetch heuristic itself is covered by the recall
    tests above)."""
    import random

    import minivectordb_tpu.ops.ivf as ivf_mod

    monkeypatch.setattr(
        ivf_mod, "masked_overfetch_width", lambda kk, f, count: count
    )
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    d, k = 16, 7
    db = VectorDatabase(
        str(tmp_path / f"fz{seed}.pkl"),
        index="ivf",
        ivf_opts={"build_threshold": 64, "nlist": 8, "nprobe": 64,
                  "iters": 4, "lists_dtype": "float32",
                  "filtered_min_frac": 0.0},
    )
    live = {}  # uid -> (vec, meta)

    def _meta():
        m = {"g": rng.randint(0, 3)}
        if rng.random() < 0.8:
            m["v"] = round(rng.uniform(-5, 5), 2)
        if rng.random() < 0.5:
            m["s"] = rng.choice(["red", "green", "blue"])
        return m

    def _add(uids):
        vecs = nprng.standard_normal((len(uids), d)).astype(np.float32)
        metas = [_meta() for _ in uids]
        db.store_embeddings_batch(list(uids), vecs, metas)
        for u, v, m in zip(uids, vecs, metas):
            live[u] = (v, m)

    _add(range(400))
    db.find_most_similar(live[0][0], k=1)  # build now
    _add(range(400, 460))  # post-build overflow
    doomed = rng.sample(sorted(live), 30)
    for u in doomed:
        db.delete_embedding(u)
        del live[u]

    def _matches(m, flt):
        for key, spec in flt.items():
            if key not in m:
                return False
            v = m[key]
            try:
                if isinstance(spec, dict):
                    for op, x in spec.items():
                        ok = {"$gt": lambda: v > x, "$gte": lambda: v >= x,
                              "$lt": lambda: v < x, "$lte": lambda: v <= x,
                              "$ne": lambda: v != x}[op]()
                        if not ok:
                            return False
                elif v != spec:
                    return False
            except TypeError:
                return False
        return True

    def _rand_filter():
        r = rng.random()
        if r < 0.3:
            return {"g": rng.randint(0, 3)}
        if r < 0.6:
            return {"g": {"$lte": rng.randint(0, 3)}}
        if r < 0.8:
            return {"v": {"$gte": round(rng.uniform(-5, 3), 2)}}
        return {"s": rng.choice(["red", "green", "blue"])}

    for trial in range(60):
        flt = _rand_filter()
        q = nprng.standard_normal(d).astype(np.float32)
        qn = q / np.linalg.norm(q)
        scored = sorted(
            (
                (float(v @ qn / np.linalg.norm(v)), u)
                for u, (v, m) in live.items()
                if _matches(m, flt)
            ),
            reverse=True,
        )
        want = [u for _, u in scored[:k]]
        ids, scores, metas = db.find_most_similar(
            q, k=k, metadata_filter=flt
        )
        assert len(ids) == len(want), (trial, flt, len(ids), len(want))
        assert set(ids) == set(want), (
            f"trial {trial} flt={flt}: got {sorted(ids)[:8]} "
            f"want {sorted(want)[:8]}"
        )
        assert list(scores) == sorted(scores, reverse=True)
        assert all(_matches(m, flt) for m in metas)


def test_int8_lists_filtered_probe_recall_and_count():
    """Filtered probing composes with int8 lists (widest quantization):
    mask applies to the quantized candidates before the exact f32 rescore."""
    db, mat, labels = _mk_db(4000, seed=40, lists_dtype="int8")
    filt = {"cluster": {"$lte": 11}}
    eligible = labels <= 11
    rng = np.random.default_rng(41)
    hits = want = 0
    for q in rng.standard_normal((12, mat.shape[1])).astype(np.float32):
        ids, scores, metas = db.find_most_similar(
            q, k=10, metadata_filter=filt
        )
        assert len(ids) == 10
        assert all(m["cluster"] <= 11 for m in metas)
        hits += len(set(ids) & set(_oracle(mat, q, 10, eligible)))
        want += 10
    assert hits / want >= 0.9
