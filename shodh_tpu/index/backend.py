"""Vector index backend selector.

Reference: ``src/vector_db/mod.rs:53`` — ``VectorIndexBackend::auto`` picks
the disk/clustered index above 100k vectors and the graph index below.
TPU translation: exact device search below IVF_MIN_VECTORS (brute force on
the MXU beats ANN well past 10^5), IVF clustered scan above; a mesh-sharded
exact index when a multi-chip mesh is supplied.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from shodh_tpu.constants import IVF_DEFAULT_NPROBE, IVF_MIN_VECTORS


class VectorIndexBackend:
    """Facade with the reference's auto-selection semantics."""

    def __init__(self, kind: str, impl):
        self.kind = kind  # "exact" | "ivf" | "sharded"
        self.impl = impl

    @classmethod
    def auto(
        cls,
        vectors: np.ndarray,
        dtype: str = "float32",
        mesh=None,
        threshold: int = IVF_MIN_VECTORS,
    ) -> "VectorIndexBackend":
        n = len(vectors)
        if mesh is not None:
            from shodh_tpu.parallel.sharded_index import ShardedVectorIndex

            return cls("sharded", ShardedVectorIndex(vectors, mesh, dtype=dtype))
        if n >= threshold:
            from shodh_tpu.index.ivf import IVFIndex

            return cls("ivf", IVFIndex(vectors, dtype=dtype))
        from shodh_tpu.index.device_index import DeviceVectorIndex

        idx = DeviceVectorIndex(dim=vectors.shape[1], dtype=dtype)
        idx.add(vectors)
        return cls("exact", idx)

    def search(self, queries: np.ndarray, k: int, nprobe: Optional[int] = None):
        if self.kind == "ivf":
            return self.impl.search(queries, k, nprobe=nprobe or IVF_DEFAULT_NPROBE)
        return self.impl.search(queries, k)
