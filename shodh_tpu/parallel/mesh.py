"""Device-mesh construction for multi-chip scale-out.

The reference has no device parallelism (SURVEY §2.9) — its scaling story
is per-user sharding on one host. Here the corpus shards across a
``jax.sharding.Mesh`` and cross-shard reductions ride ICI collectives.
Axes:
  - ``shard``: corpus rows (the big axis — "tensor parallel" for retrieval)
  - ``data``: query batches (data parallel), used by the training step

Tests exercise this on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``); the same code drives real
multi-chip slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_mesh_2d(data: int, shard: int) -> Mesh:
    devs = np.asarray(jax.devices()[: data * shard]).reshape(data, shard)
    return Mesh(devs, ("data", "shard"))


def shard_rows(mesh: Mesh, axis: str = "shard") -> NamedSharding:
    """Rows split across the mesh; trailing dims replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
