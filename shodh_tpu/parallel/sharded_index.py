"""Corpus-sharded exact top-k over a device mesh (config 5 scale-out).

Design (SURVEY §2.9 mapping): the (N, D) corpus splits row-wise across the
``shard`` mesh axis. Under ``shard_map`` each device computes a local
top-k over its rows (reusing the single-chip kernels), then the k
candidates per shard are all-gathered over ICI and the final top-k is a
replicated merge of n_shards * k candidates — the classic partial-top-k +
gather-merge pattern. Communication is O(shards * k * 8 bytes), not O(N).

Global row id = shard_index * rows_per_shard + local row, so results are
identical to the single-chip index (same tie-break discipline: the merge
concatenates shards in ascending shard order, ascending local row).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shodh_tpu.ops.distance import NEG_INF, masked_scores


def _local_topk(queries, corpus_shard, valid_shard, scales_shard, k, axis):
    """Per-shard partial top-k + ICI all-gather merge. Runs inside shard_map."""
    rows_per_shard = corpus_shard.shape[0]
    shard_idx = jax.lax.axis_index(axis)
    scores = masked_scores(queries, corpus_shard, valid_shard, scales_shard)
    kk = min(k, rows_per_shard)
    # Two-level group selection on the local score matrix (bit-identical to
    # lax.top_k; ~1.5x cheaper at large shard sizes — see ops/fused_topk.py)
    from shodh_tpu.ops.fused_topk import exact_topk_scores

    vals, local_rows = exact_topk_scores(scores, kk)  # (B, kk)
    global_rows = local_rows.astype(jnp.int32) + shard_idx * rows_per_shard
    # All-gather each shard's candidates over ICI -> (S, B, kk)
    all_vals = jax.lax.all_gather(vals, axis)
    all_rows = jax.lax.all_gather(global_rows, axis)
    s, b, _ = all_vals.shape
    # (B, S*kk) in ascending shard order -> deterministic tie-break
    merged_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, s * kk)
    merged_rows = jnp.transpose(all_rows, (1, 0, 2)).reshape(b, s * kk)
    out_vals, pos = jax.lax.top_k(merged_vals, min(k, s * kk))
    out_rows = jnp.take_along_axis(merged_rows, pos, axis=-1)
    return out_vals, out_rows


class ShardedVectorIndex:
    """Exact top-k over a row-sharded corpus on a device mesh."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        axis: str = "shard",
        dtype: str = "float32",
    ):
        vectors = np.asarray(vectors, np.float32)
        self.mesh = mesh
        self.axis = axis
        n_shards = mesh.shape[axis]
        n, d = vectors.shape
        # Pad N to a multiple of the shard count
        padded_n = ((n + n_shards - 1) // n_shards) * n_shards
        self.n = n
        self.dim = d
        self.n_shards = n_shards
        valid = np.zeros(padded_n, np.float32)
        valid[:n] = 1.0
        buf = np.zeros((padded_n, d), np.float32)
        buf[:n] = vectors
        if dtype == "int8":
            from shodh_tpu.index.device_index import _quantize_int8_np

            q, s = _quantize_int8_np(buf)
            corpus_np, scales_np = q, s
        else:
            corpus_np, scales_np = buf, np.ones(padded_n, np.float32)
        row_sharding = NamedSharding(mesh, P(axis))
        scalar_sharding = NamedSharding(mesh, P(axis))
        self._corpus = jax.device_put(corpus_np, row_sharding)
        self._scales = jax.device_put(scales_np, scalar_sharding)
        self._valid = jax.device_put(valid, scalar_sharding)
        self._search_fn = None
        self._search_k = None

    def _build_search(self, k: int):
        axis = self.axis
        mesh = self.mesh

        @jax.jit
        def search(queries, corpus, valid, scales):
            fn = jax.shard_map(
                partial(_local_topk, k=k, axis=axis),
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis)),
                out_specs=(P(), P()),
                # outputs are replicated by construction (all_gather + identical
                # merge on every shard); the static VMA check can't see through
                # top_k, so it is disabled here.
                check_vma=False,
            )
            return fn(queries, corpus, valid, scales)

        return search

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self._search_fn is None or self._search_k != k:
            self._search_fn = self._build_search(k)
            self._search_k = k
        vals, rows = self._search_fn(
            jnp.asarray(queries), self._corpus, self._valid, self._scales
        )
        vals = np.asarray(vals)
        rows = np.asarray(rows).astype(np.int64)
        rows = np.where(vals > NEG_INF / 2, rows, -1)
        return vals, rows
