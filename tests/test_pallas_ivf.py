"""Paged Pallas IVF probe must match the XLA IVF search exactly (interpret
mode on CPU; compiled on TPU via bench/drive runs)."""

import numpy as np

import jax.numpy as jnp

from minivectordb_tpu.ops.ivf import IVFIndex, _ivf_search
from minivectordb_tpu.ops.pallas_ivf import pallas_ivf_search


def test_pallas_ivf_matches_xla_path():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((3000, 128)).astype(np.float32)
    index = IVFIndex(nlist=16, nprobe=6, iters=5)
    index.build(mat)
    q = jnp.asarray(rng.standard_normal((5, 128)).astype(np.float32))

    xv, xi = _ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 6, 10,
    )
    pv, pi = pallas_ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 6, 10,
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5,
                               atol=1e-6)


def test_pallas_ivf_query_chunking():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((2000, 128)).astype(np.float32)
    index = IVFIndex(nlist=8, nprobe=4, iters=3)
    index.build(mat)
    q = jnp.asarray(rng.standard_normal((70, 128)).astype(np.float32))  # > chunk

    xv, xi = _ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 4, 5,
    )
    pv, pi = pallas_ivf_search(
        index.centroids, index._lists, index._list_ids, index._list_valid,
        q, 4, 5,
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
