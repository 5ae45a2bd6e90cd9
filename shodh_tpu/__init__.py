"""shodh_tpu — a TPU-native cognitive memory engine.

A from-scratch rebuild of the capabilities of shodh-memory
(github.com/varun29ankuS/shodh-memory) designed for TPU hardware:

- Embedding inference (MiniLM-L6-v2) as a JAX model on the MXU instead of
  ONNX Runtime on CPU (reference: src/embeddings/minilm.rs).
- The vector store as a device-resident, optionally sharded ``(N, 384)``
  matrix with fused Pallas distance+top-k kernels instead of a Vamana graph
  walk (reference: src/vector_db/vamana.rs, distance_inline.rs).
- ANN index construction (k-means partitioning, product quantization) as
  batched XLA programs (reference: src/vector_db/spann.rs, pq.rs).
- The cognitive ranking layer — Hebbian strength, exponential→power-law
  decay, spreading activation, RRF fusion, the L0.4–L5 boost stack — as
  vectorized device score fusion (reference: src/memory/mod.rs:2052-5400).
- Multi-chip scale via ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives over ICI (reference has no device parallelism; see SURVEY §2.9).

Host-side orchestration (storage, HTTP/IPC transports, the knowledge graph's
mutable state, schedulers) stays conventional Python/C++.
"""

__version__ = "0.1.0"

from shodh_tpu.types import (
    Experience,
    ExperienceType,
    GeoFilter,
    LayerMode,
    Memory,
    MemoryTier,
    Query,
    RetrievalMode,
)

__all__ = [
    "Experience",
    "ExperienceType",
    "GeoFilter",
    "LayerMode",
    "Memory",
    "MemorySystem",
    "MemoryTier",
    "Query",
    "RetrievalMode",
    "__version__",
]


def __getattr__(name):
    # Lazy import: keep `import shodh_tpu` light (no JAX import) for clients
    # that only need types or the HTTP SDK.
    if name == "MemorySystem":
        from shodh_tpu.engine.memory_system import MemorySystem

        return MemorySystem
    raise AttributeError(f"module 'shodh_tpu' has no attribute {name!r}")
