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
