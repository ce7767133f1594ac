"""minivectordb_tpu — a TPU-native vector database + embedding framework.

A from-scratch re-design of the capabilities of cnmoro/MiniVectorDB
(reference: /root/reference, v2.3.1) for TPU hardware:

- the FAISS ``IndexFlatIP`` exact scan (reference vector_database.py:42-47,
  495-523) becomes a fused, jitted masked cosine matmul + on-device top-k
  over an HBM-resident packed matrix (XLA path in ``ops/scan.py``, Pallas
  tiled kernels in ``ops/pallas_scan.py``);
- the usearch int8 cosine index (reference sharded_vector_database_usearch.py:621-627)
  becomes an int8-quantized variant of the same scan;
- the ONNX / torch / FlagEmbedding encoders (reference embedding_model.py)
  become one functional JAX transformer encoder family (``models/``);
- storage sharding (reference sharded_vector_database.py) keeps its on-disk
  pickle semantics but maps search onto a ``jax.sharding.Mesh`` with
  shard-local top-k + ICI all-gather merge (``parallel/``).

Public API mirrors the reference module-for-module:

    from minivectordb_tpu.vector_database import VectorDatabase
    from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase
    from minivectordb_tpu.sharded_vector_database_usearch import ShardedVectorDatabaseUsearch
    from minivectordb_tpu.embedding_model import EmbeddingModel, AlternativeModel
"""

__version__ = "0.1.0"


def _setup_compilation_cache() -> None:
    """Persist compiled XLA programs across processes.

    Cold starts pay 20-60 s of compile per program shape on TPU (the
    round-2 config5 first search spent most of its 210 s there); JAX's
    persistent compilation cache removes that for every shape seen before.
    On by default — disable with MINIVECTORDB_TPU_NO_COMPILE_CACHE=1, or
    point MINIVECTORDB_TPU_COMPILE_CACHE at a shared directory.
    """
    import os

    if os.environ.get("MINIVECTORDB_TPU_NO_COMPILE_CACHE"):
        return
    path = os.environ.get(
        "MINIVECTORDB_TPU_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "minivectordb_tpu", "xla"
        ),
    )
    try:
        import jax

        # never override a cache the user configured themselves (their own
        # env var or an explicit jax.config.update before importing us)
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return
        if jax.config.jax_compilation_cache_dir:
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # don't spend disk on trivial programs; a 1 s floor keeps every
        # scan/encoder/IVF program while skipping scalar glue
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_setup_compilation_cache()

from minivectordb_tpu.vector_database import VectorDatabase
from minivectordb_tpu.sharded_vector_database import ShardedVectorDatabase
from minivectordb_tpu.sharded_vector_database_usearch import ShardedVectorDatabaseUsearch
from minivectordb_tpu.embedding_model import EmbeddingModel, AlternativeModel

__all__ = [
    "VectorDatabase",
    "ShardedVectorDatabase",
    "ShardedVectorDatabaseUsearch",
    "EmbeddingModel",
    "AlternativeModel",
    "__version__",
]
