"""Randomized differential fuzz of the filter engine.

Generates corpora with mixed-type metadata columns (ints, floats, bools,
strings, naive datetimes, missing keys) and random filter triples, then
compares the engine's candidate mask bit-for-bit against a brute-force
Python oracle implementing the reference's documented semantics
(AND -> OR(∩) -> EXCLUDE(−); multi-operator dicts apply ALL operators; rows
must hold the key; non-comparable values never match). This guards the
columnar fast path, the equality index and the Python fallback against each
other on inputs no hand-written case enumerates.
"""

import datetime
import random

import numpy as np
import pytest

from minivectordb_tpu.vector_database import VectorDatabase

KEYS = ["a", "b", "c", "d"]
OPS = ["$gt", "$gte", "$lt", "$lte", "$ne", "$in"]


def _rand_value(rng):
    kind = rng.choice(["int", "float", "str", "bool", "dt", "none"])
    if kind == "int":
        return rng.randint(-5, 5)
    if kind == "float":
        return round(rng.uniform(-5, 5), 2)
    if kind == "str":
        return rng.choice(["red", "green", "blue", "zeta"])
    if kind == "bool":
        return rng.choice([True, False])
    if kind == "dt":
        return datetime.datetime(2026, 1, 1) + datetime.timedelta(
            hours=rng.randint(0, 500)
        )
    return None


def _rand_stored(rng):
    # stored values are sometimes collections: the reference's $in means
    # "filter value is a MEMBER of the stored value" (vector_database.py:172)
    if rng.random() < 0.25:
        return [_rand_value(rng) for _ in range(rng.choice([1, 2, 3]))]
    return _rand_value(rng)


def _rand_meta(rng):
    return {
        k: _rand_stored(rng) for k in KEYS if rng.random() < 0.7
    }


def _rand_cond(rng, pool):
    """(key, spec) — spec is a plain value (equality) or an operator dict."""
    key = rng.choice(KEYS)
    base = rng.choice(pool) if pool and rng.random() < 0.7 else _rand_value(rng)
    if rng.random() < 0.45:
        return key, base
    ops = rng.sample(OPS, rng.choice([1, 1, 1, 2]))
    spec = {op: base for op in ops}  # $in: filter value ∈ stored collection
    return key, spec


def _rand_filter_dict(rng, pool):
    out = {}
    for _ in range(rng.choice([1, 1, 2])):
        k, spec = _rand_cond(rng, pool)
        out[k] = spec
    return out


def _cond_match(meta, key, spec):
    if key not in meta:
        return False
    v = meta[key]
    if isinstance(spec, dict):
        for op, x in spec.items():
            try:
                if op == "$gt":
                    ok = v > x
                elif op == "$gte":
                    ok = v >= x
                elif op == "$lt":
                    ok = v < x
                elif op == "$lte":
                    ok = v <= x
                elif op == "$ne":
                    ok = v != x
                elif op == "$in":
                    # the reference's $in is REVERSED vs Mongo: the filter
                    # value must be a member of the stored value
                    # (reference vector_database.py:172, lambda x, y: y in x)
                    ok = x in v
                else:  # pragma: no cover
                    raise AssertionError(op)
            except TypeError:
                return False
            if not ok:
                return False
        return True
    try:
        return v == spec
    except TypeError:  # pragma: no cover
        return False


def _oracle(metas, metadata_filter, exclude_filter, or_filters):
    n = len(metas)
    rows = set(range(n))
    if metadata_filter:
        flt = ([metadata_filter] if isinstance(metadata_filter, dict)
               else metadata_filter)
        for f in flt:
            for k, spec in f.items():
                rows &= {i for i in range(n) if _cond_match(metas[i], k, spec)}
    if or_filters:
        ors = [or_filters] if isinstance(or_filters, dict) else or_filters
        ors = [f for f in ors if f]
        if ors:
            # within one or-dict, keys UNION (the reference's
            # _apply_or_filter updates key_indices per key,
            # vector_database.py:201); dicts union with each other; the
            # whole OR result intersects the AND result
            union = set()
            for f in ors:
                for k, spec in f.items():
                    union |= {
                        i for i in range(n) if _cond_match(metas[i], k, spec)
                    }
            rows &= union
    if exclude_filter:
        exc = ([exclude_filter] if isinstance(exclude_filter, dict)
               else exclude_filter)
        for f in exc:
            for k, v in f.items():
                rows -= {i for i in range(n) if _cond_match(metas[i], k, v)}
    return rows


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_filter_engine_matches_python_oracle(tmp_path, seed):
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    n = 300
    metas = [_rand_meta(rng) for _ in range(n)]
    pool = [v for m in metas for v in m.values() if v is not None][:40]
    db = VectorDatabase(storage_file=str(tmp_path / f"f{seed}.pkl"))
    db.store_embeddings_batch(
        list(range(n)),
        list(nprng.standard_normal((n, 8)).astype(np.float32)),
        metas,
    )
    eng = db._engine
    for trial in range(120):
        md = _rand_filter_dict(rng, pool) if rng.random() < 0.8 else None
        orf = (
            [_rand_filter_dict(rng, pool) for _ in range(rng.choice([1, 2]))]
            if rng.random() < 0.4 else None
        )
        # exclude is equality-only in the reference
        exc = (
            {rng.choice(KEYS): rng.choice(pool) if pool else 1}
            if rng.random() < 0.4 else None
        )
        want = _oracle(metas, md, exc, orf)
        with eng.lock:
            mask, n_cand = eng._candidate_mask(md, exc, orf)
        got = set(range(n)) if mask is None else set(np.where(mask)[0])
        assert got == want, (
            f"trial {trial}: md={md} or={orf} exc={exc}\n"
            f"only engine: {sorted(got - want)[:5]} "
            f"only oracle: {sorted(want - got)[:5]}"
        )
        assert n_cand == len(want)
