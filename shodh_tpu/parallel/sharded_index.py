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

Round-5 (verdict #2): the per-shard selection is the SAME
``two_level_topk`` entry the single-chip index uses — for an int8 corpus
the certificate pack (sv, cnorm, cg; ops/fused_topk.corpus_cert_pack) is
row-sharded alongside the corpus, so each shard runs the certified
int8-MXU v3 selection with its own exact-or-fallback ``lax.cond``. A
shard that falls back still returns exact local top-k, so the cross-shard
merge is bit-equal to the flat path by construction (both branches are
exact). The old formulation materialized the full per-shard f32 score
matrix (``masked_scores``) — exactly the HBM traffic the single-chip
work eliminated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shodh_tpu.ops.distance import NEG_INF


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(corpus, updates, rows):
    """In-place (donated) row scatter; preserves the input's sharding."""
    return corpus.at[rows].set(updates.astype(corpus.dtype))


@partial(jax.jit, donate_argnums=(0,))
def _scatter_vals(vec, updates, rows):
    return vec.at[rows].set(updates)


def _local_topk(queries, corpus_shard, valid_shard, scales_shard, *pack, k, axis):
    """Per-shard partial top-k + ICI all-gather merge. Runs inside shard_map.

    ``pack`` is the row-sharded certificate pack (sv, cnorm, cg) for an
    int8 corpus — two_level_topk then runs the certified v3 selection with
    a per-shard exact fallback; without it (f32 corpus) it runs the same
    masked-scores group selection as before (bit-identical to lax.top_k)."""
    from shodh_tpu.ops.fused_topk import two_level_topk

    rows_per_shard = corpus_shard.shape[0]
    shard_idx = jax.lax.axis_index(axis)
    kk = min(k, rows_per_shard)
    vals, local_rows = two_level_topk(
        queries, corpus_shard, valid_shard, kk,
        scales=scales_shard, int8_pack=pack if pack else None,
    )
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
        spare_capacity: int = 0,
    ):
        vectors = np.asarray(vectors, np.float32)
        self.mesh = mesh
        self.axis = axis
        self.dtype = dtype
        n_shards = mesh.shape[axis]
        n, d = vectors.shape
        if dtype == "int8":
            from shodh_tpu.ops.fused_topk import _v3_sgroup

            self._sgroup = _v3_sgroup()
        else:
            self._sgroup = 1
        # Pad N (+ delta-append headroom) to a multiple of the shard count
        # (times the certificate selection-group size for int8, so the
        # row-sharded cg mirror tiles every shard exactly).
        # Row layout is BLOCK-partitioned (global row = shard * rows_per_shard
        # + local), so ascending-shard/ascending-local merge order IS
        # ascending global row order — equal-score ties therefore break on
        # the lowest global row exactly like the single-chip lax.top_k,
        # regardless of which shard holds which tied row.
        align = n_shards * self._sgroup
        padded_n = ((n + spare_capacity + align - 1) // align) * align
        self.n = n
        self.dim = d
        self.n_shards = n_shards
        self.capacity = padded_n
        self._deleted = 0
        valid = np.zeros(padded_n, np.float32)
        valid[:n] = 1.0
        buf = np.zeros((padded_n, d), np.float32)
        buf[:n] = vectors
        self._host_vectors = buf  # canonical f32 copy for delta/compaction
        self._host_valid = valid
        self._upload(buf, valid)
        self._search_fn = None
        self._search_k = None

    def _upload(self, buf: np.ndarray, valid: np.ndarray) -> None:
        if self.dtype == "int8":
            from shodh_tpu.index.device_index import _quantize_int8_np

            corpus_np, scales_np = _quantize_int8_np(buf)
        else:
            corpus_np, scales_np = buf, np.ones(len(buf), np.float32)
        row_sharding = NamedSharding(self.mesh, P(self.axis))
        self._corpus = jax.device_put(corpus_np, row_sharding)
        self._scales = jax.device_put(scales_np, row_sharding)
        self._valid = jax.device_put(valid, row_sharding)
        self._host_scales = scales_np.astype(np.float32)
        if self.dtype == "int8":
            # Certificate pack mirrors (corpus_cert_pack's (sv, cn, cg)),
            # computed host-side from the SAME quantized rows the device
            # holds and row-sharded with the corpus. Host rawnorm mirror
            # (||int8 row||_2, scale/valid-independent) supports O(rows)
            # incremental maintenance under add/delete.
            self._host_rawnorm = np.sqrt(
                (corpus_np.astype(np.float32) ** 2).sum(axis=1)
            ).astype(np.float32)
            sv = (scales_np * valid).astype(np.float32)
            cn = self._host_rawnorm * sv
            cg = cn.reshape(-1, self._sgroup).max(axis=1)
            self._sv = jax.device_put(sv, row_sharding)
            self._cn = jax.device_put(cn, row_sharding)
            self._cg = jax.device_put(cg, row_sharding)
        else:
            self._host_rawnorm = None
            self._sv = self._cn = self._cg = None

    def _pack(self):
        return (self._sv, self._cn, self._cg) if self._sv is not None else ()

    def _refresh_pack_rows(self, rows: np.ndarray) -> None:
        """Recompute pack entries for mutated rows + their selection groups
        from the host mirrors, then scatter to the device pack."""
        if self._sv is None:
            return
        sv_rows = (
            self._host_scales[rows] * self._host_valid[rows]
        ).astype(np.float32)
        cn_rows = (self._host_rawnorm[rows] * sv_rows).astype(np.float32)
        self._sv = _scatter_vals(self._sv, jnp.asarray(sv_rows), jnp.asarray(rows))
        self._cn = _scatter_vals(self._cn, jnp.asarray(cn_rows), jnp.asarray(rows))
        groups = np.unique(rows // self._sgroup).astype(np.int32)
        cn_all = self._host_rawnorm * self._host_scales * self._host_valid
        cg_rows = cn_all.reshape(-1, self._sgroup).max(axis=1)[groups].astype(np.float32)
        self._cg = _scatter_vals(self._cg, jnp.asarray(cg_rows), jnp.asarray(groups))

    def _update_rows(self, rows: list[int], vectors: np.ndarray) -> None:
        """Incremental device update: ship ONLY the new rows and scatter
        them in place on the mesh (a full re-quantize + re-device_put per
        delta append was O(N·D) host→device traffic per call — the very
        cost the 'delta append into spare capacity' design exists to
        avoid). The donated .at[].set keeps the row sharding and moves
        bytes at HBM speed, not tunnel speed."""
        if self.dtype == "int8":
            from shodh_tpu.index.device_index import _quantize_int8_np

            q, s = _quantize_int8_np(vectors)
        else:
            q, s = vectors.astype(np.float32), np.ones(len(vectors), np.float32)
        idx = np.asarray(rows, np.int32)
        self._corpus = _scatter_rows(self._corpus, jnp.asarray(q), jnp.asarray(idx))
        self._scales = _scatter_vals(self._scales, jnp.asarray(s), jnp.asarray(idx))
        self._valid = _scatter_vals(
            self._valid, jnp.ones(len(idx), jnp.float32), jnp.asarray(idx)
        )
        self._host_scales[idx] = s
        if self._host_rawnorm is not None:
            self._host_rawnorm[idx] = np.sqrt(
                (q.astype(np.float32) ** 2).sum(axis=1)
            )
        self._refresh_pack_rows(idx)

    def _update_valid(self, rows: list[int], value: float) -> None:
        idx = np.asarray(rows, np.int32)
        self._valid = _scatter_vals(
            self._valid, jnp.full(len(idx), value, jnp.float32), jnp.asarray(idx)
        )
        self._refresh_pack_rows(idx)

    # -- mutation (config 5 scale-out lifecycle: delta append, soft delete,
    # -- compaction; mirrors index/device_index.py single-chip semantics) --

    def add(self, vectors: np.ndarray) -> list[int]:
        """Delta append into spare capacity; returns assigned global rows.
        Grows capacity (with re-shard) when headroom runs out."""
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        count = len(vectors)
        grew = False
        if self.n + count > self.capacity:
            grow = max(self.capacity, self.n + count)
            align = self.n_shards * self._sgroup
            padded = ((grow + align - 1) // align) * align
            buf = np.zeros((padded, self.dim), np.float32)
            buf[: len(self._host_vectors)] = self._host_vectors
            valid = np.zeros(padded, np.float32)
            valid[: len(self._host_valid)] = self._host_valid
            self._host_vectors, self._host_valid = buf, valid
            self.capacity = padded
            grew = True
        rows = list(range(self.n, self.n + count))
        self._host_vectors[self.n : self.n + count] = vectors
        self._host_valid[self.n : self.n + count] = 1.0
        self.n += count
        if grew:
            # shape change: the mesh allocation must rebuild wholesale
            self._upload(self._host_vectors, self._host_valid)
        else:
            self._update_rows(rows, vectors)
        return rows

    def delete(self, rows: list[int]) -> None:
        """Soft delete: rows stop matching immediately; space reclaims at
        compaction."""
        hit = []
        for r in rows:
            if 0 <= r < self.n and self._host_valid[r] > 0:
                self._host_valid[r] = 0.0
                self._deleted += 1
                hit.append(r)
        if hit:
            self._update_valid(hit, 0.0)

    def compact(self) -> dict[int, int]:
        """Drop soft-deleted rows and repack; returns old->new row map."""
        live = np.nonzero(self._host_valid[: self.n] > 0)[0]
        mapping = {int(old): new for new, old in enumerate(live)}
        vectors = self._host_vectors[live]
        self.__init__(
            vectors, self.mesh, axis=self.axis, dtype=self.dtype,
            spare_capacity=self.capacity - len(live),
        )
        return mapping

    def __len__(self) -> int:
        return self.n - self._deleted

    def _build_search(self, k: int):
        axis = self.axis
        mesh = self.mesh
        n_pack = len(self._pack())

        @jax.jit
        def search(queries, corpus, valid, scales, *pack):
            fn = jax.shard_map(
                partial(_local_topk, k=k, axis=axis),
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis)) + (P(axis),) * n_pack,
                out_specs=(P(), P()),
                # outputs are replicated by construction (all_gather + identical
                # merge on every shard); the static VMA check can't see through
                # top_k, so it is disabled here.
                check_vma=False,
            )
            return fn(queries, corpus, valid, scales, *pack)

        return search

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self._search_fn is None or self._search_k != k:
            self._search_fn = self._build_search(k)
            self._search_k = k
        vals, rows = self._search_fn(
            jnp.asarray(queries), self._corpus, self._valid, self._scales,
            *self._pack(),
        )
        vals = np.asarray(vals)
        rows = np.asarray(rows).astype(np.int64)
        rows = np.where(vals > NEG_INF / 2, rows, -1)
        return vals, rows
