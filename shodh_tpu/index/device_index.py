"""Device-resident exact vector index.

The TPU-native replacement for the reference's Vamana/DiskANN graph index
(``src/vector_db/vamana.rs``): instead of a pointer-chasing greedy walk
(hostile to the MXU/XLA model), the corpus lives as a padded device matrix
and queries run as batched matmul + exact top-k. Brute force on TPU beats
graph ANN well past 10^5 vectors; above that the fused two-level kernel
(ops/fused_topk.py) keeps the score matrix out of HBM, and the IVF index
(index/ivf.py) bounds work at the 10^6+ scale.

Semantics carried over from the reference index:
- insert-ordered integer row ids (stable; the tie-break axis),
- soft delete via a validity mask (vamana.rs soft-delete filtering),
- deferred ingest: adds buffer on host and flush to device in batches
  (replaces Vamana's incremental insert + rebuild counters; compaction
  rebuilds the padded arrays when the deleted fraction crosses 30%,
  matching vamana.rs:103-115's compaction threshold),
- save/load with checksum (vamana_persist.rs).

Capacity grows in INDEX_CAPACITY_QUANTUM steps so XLA sees few distinct
shapes (compile cache stays warm).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Optional

import numpy as np

from shodh_tpu.constants import INDEX_CAPACITY_QUANTUM

_BRUTE_MAX = 65_536  # above this, use the fused two-level kernel
# At/below this capacity the search runs on host BLAS: a (B, 16k)x384 matmul
# is tens of microseconds on CPU, far below a single device dispatch through
# the runtime (and orders of magnitude below it through a remote TPU tunnel).
# The device paths win when the corpus is large or queries are batched.
_HOST_MAX = 16_384
_COMPACT_DELETED_FRACTION = 0.30
_BATCH_SIZES = (8, 32, 128, 256)  # padded query-batch shapes to bound retraces


def _quantize_int8_np(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    absmax = np.max(np.abs(vectors), axis=-1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(vectors / scales[:, None]), -127, 127).astype(np.int8)
    return q, scales


def _pad_batch(b: int) -> int:
    for s in _BATCH_SIZES:
        if b <= s:
            return s
    return ((b + 255) // 256) * 256


def _pad_k(k: int) -> int:
    return min(max(16, 1 << (k - 1).bit_length()), 1024)


class DeviceVectorIndex:
    """Exact cosine top-k over a device-resident (padded) corpus matrix."""

    def __init__(self, dim: int = 384, dtype: str = "float32"):
        assert dtype in ("float32", "int8")
        self.dim = dim
        self.dtype = dtype
        self._count = 0
        self._capacity = 0
        # Host mirrors (source of truth for persistence/compaction/growth)
        self._vecs_np = np.zeros((0, dim), np.int8 if dtype == "int8" else np.float32)
        self._scales_np = np.zeros((0,), np.float32)
        self._valid_np = np.zeros((0,), np.float32)
        # Pending (not yet on device) host rows
        self._pending: list[np.ndarray] = []
        self._pending_rows = 0
        # Device arrays (lazily materialized)
        self._device = None  # tuple(vecs, scales, valid, score_bound, approx, int8_pack) | None
        # HBM residency (state.rs:748 shared-cache analog, TPU-first): when
        # SHODH_HBM_BUDGET_BYTES caps device memory, only the NEWEST rows
        # (recency ~ heat for a memory engine) stay resident; rows before
        # _device_start spill to the host mirror and score via BLAS, with
        # exact deterministic cross-engine merge in search().
        self._device_start = 0
        self._n_deleted = 0
        # Compaction epoch: bumped on every maybe_compact, persisted in the
        # snapshot AND (by the engine, in the same write batch as the row
        # remap) in the kv store. A mismatch at open means the on-disk
        # snapshot and the kv row maps describe different row layouts — the
        # crash window between a compaction and the next save() — and the
        # engine rebuilds (memory_system._maybe_recover_index).
        self.epoch = 0

    @staticmethod
    def _hbm_budget() -> int:
        import os

        return int(os.environ.get("SHODH_HBM_BUDGET_BYTES", "0"))  # 0 = unlimited

    def _spill_start(self) -> int:
        """First row of the device-resident suffix window (0 = all resident)."""
        budget = self._hbm_budget()
        if budget <= 0 or self._capacity == 0:
            return 0
        itemsize = 1 if self.dtype == "int8" else 4
        # corpus + bf16 mirror + scales + valid per row
        bytes_per_row = self.dim * itemsize + self.dim * 2 + 8
        from shodh_tpu.ops.fused_topk import TILE_N

        max_rows = max(TILE_N, (budget // bytes_per_row) // TILE_N * TILE_N)
        if self._capacity <= max_rows:
            return 0
        return self._capacity - max_rows

    # -- properties ---------------------------------------------------------

    def __len__(self) -> int:
        return self._count

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def n_deleted(self) -> int:
        return self._n_deleted

    @property
    def n_active(self) -> int:
        return self._count - self._n_deleted

    def row_active(self, row: int) -> bool:
        """True when ``row`` exists and is not soft-deleted (crash-recovery
        and fsck validity probe)."""
        self.flush()
        return 0 <= row < self._count and self._valid_np[row] == 1.0

    # -- ingest -------------------------------------------------------------

    def add(self, vectors: np.ndarray) -> list[int]:
        """Append L2-normalized vectors; returns assigned row ids."""
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        assert vectors.shape[1] == self.dim
        rows = list(range(self._count, self._count + len(vectors)))
        self._pending.append(vectors)
        self._pending_rows += len(vectors)
        self._count += len(vectors)
        return rows

    def delete_rows(self, rows) -> None:
        """Soft delete; space reclaimed at the next compaction-triggering flush."""
        self.flush()
        for r in rows:
            if 0 <= r < self._count and self._valid_np[r] == 1.0:
                self._valid_np[r] = 0.0
                self._n_deleted += 1
        self._device = None

    def flush(self) -> None:
        """Materialize pending adds into the host mirror.

        When capacity is unchanged and device arrays exist, the new rows are
        written in place with dynamic_update_slice (streaming ingest never
        re-uploads the whole corpus); growth or deletion invalidates the
        device copy for a full refresh.
        """
        if not self._pending:
            return
        new = np.concatenate(self._pending, axis=0)
        self._pending = []
        self._pending_rows = 0
        n_new = len(new)
        end = self._count
        start = end - n_new
        grew = end > self._capacity
        if grew:
            self._grow(end)
        if self.dtype == "int8":
            q, s = _quantize_int8_np(new)
            self._vecs_np[start:end] = q
            self._scales_np[start:end] = s
        else:
            self._vecs_np[start:end] = new
        self._valid_np[start:end] = 1.0
        if grew or self._device is None or self._device_start > 0:
            # growth, no device copy yet, or active HBM spill (the resident
            # window must re-slide) -> full refresh at next search
            self._device = None
            return
        # In-place device append (delta update, no corpus re-upload)
        import jax
        import jax.numpy as jnp

        vecs, scales, valid, bound, approx, int8_pack = self._device
        vecs = jax.lax.dynamic_update_slice(
            vecs, jnp.asarray(self._vecs_np[start:end]), (start, 0)
        )
        scales = jax.lax.dynamic_update_slice(
            scales, jnp.asarray(self._scales_np[start:end]), (start,)
        )
        valid = jax.lax.dynamic_update_slice(
            valid, jnp.ones((n_new,), jnp.float32), (start,)
        )
        # Certificate bound only grows on append (soft deletes only shrink
        # the true max, and a larger bound stays sound) — fold in the new
        # rows' scale*norm on host, no device pass needed.
        new_slice = self._vecs_np[start:end].astype(np.float32)
        new_term = float(
            np.max(np.linalg.norm(new_slice, axis=1) * self._scales_np[start:end])
        )
        # Mirror delta: pre-scaled bf16 rows appended in place.
        approx = jax.lax.dynamic_update_slice(
            approx,
            jnp.asarray(
                new_slice * self._scales_np[start:end][:, None]
            ).astype(jnp.bfloat16),
            (start, 0),
        )
        if int8_pack is not None:
            # Certificate-v3 pack delta-append (norms only, no mirror):
            # scatter the new rows' svalid/cnorm, and raise the per-group
            # max cnorm where needed — a LARGER cg stays one-sided-sound,
            # and max() only grows it, so no full rebuild is required.
            svalid8, cnorm8, cg8 = int8_pack
            sg8 = svalid8.shape[0] // cg8.shape[0]
            sv_new = self._scales_np[start:end]
            cn_new = (
                np.linalg.norm(new_slice, axis=1) * sv_new
            ).astype(np.float32)
            svalid8 = jax.lax.dynamic_update_slice(
                svalid8, jnp.asarray(sv_new), (start,)
            )
            cnorm8 = jax.lax.dynamic_update_slice(
                cnorm8, jnp.asarray(cn_new), (start,)
            )
            g_lo = start // sg8
            g_hi = (end - 1) // sg8 + 1
            cg_new = np.full(g_hi - g_lo, -np.inf, np.float32)
            for r, cn in zip(range(start, end), cn_new):
                gi = r // sg8 - g_lo
                if cn > cg_new[gi]:
                    cg_new[gi] = cn
            cg8 = jax.lax.dynamic_update_slice(
                cg8,
                jnp.maximum(
                    jax.lax.dynamic_slice(cg8, (g_lo,), (g_hi - g_lo,)),
                    jnp.asarray(cg_new),
                ),
                (g_lo,),
            )
            int8_pack = (svalid8, cnorm8, cg8)
        self._device = (vecs, scales, valid, jnp.maximum(bound, new_term), approx,
                        int8_pack)

    def _grow(self, min_rows: int) -> None:
        quantum = INDEX_CAPACITY_QUANTUM
        new_cap = ((min_rows + quantum - 1) // quantum) * quantum
        pad = new_cap - self._capacity
        self._vecs_np = np.concatenate(
            [self._vecs_np, np.zeros((pad, self.dim), self._vecs_np.dtype)], axis=0
        )
        self._scales_np = np.concatenate([self._scales_np, np.ones((pad,), np.float32)])
        self._valid_np = np.concatenate([self._valid_np, np.zeros((pad,), np.float32)])
        self._capacity = new_cap

    def maybe_compact(self) -> Optional[dict[int, int]]:
        """Rebuild without deleted rows when the deleted fraction crosses 30%.

        Returns an old-row -> new-row mapping when compaction ran (callers
        re-map their row references), else None.
        """
        if self._count == 0 or self._n_deleted / max(1, self._count) < _COMPACT_DELETED_FRACTION:
            return None
        self.epoch += 1
        self.flush()
        keep = np.nonzero(self._valid_np[: self._count] == 1.0)[0]
        mapping = {int(old): new for new, old in enumerate(keep)}
        kept_vecs = self._vecs_np[keep]
        kept_scales = self._scales_np[keep]
        self._count = len(keep)
        self._n_deleted = 0
        self._capacity = 0
        self._vecs_np = np.zeros((0, self.dim), self._vecs_np.dtype)
        self._scales_np = np.zeros((0,), np.float32)
        self._valid_np = np.zeros((0,), np.float32)
        if len(keep):
            self._grow(self._count)
            self._vecs_np[: self._count] = kept_vecs
            self._scales_np[: self._count] = kept_scales
            self._valid_np[: self._count] = 1.0
        self._device = None
        return mapping

    # -- search -------------------------------------------------------------

    def _device_arrays(self):
        import jax.numpy as jnp

        self.flush()
        if self._device is None and self._capacity > 0:
            from shodh_tpu.ops.fused_topk import (
                _int8_enabled,
                _int8_min_rows,
                corpus_approx_bf16,
                corpus_cert_pack_default,
                corpus_score_bound,
            )

            start = self._spill_start()
            self._device_start = start
            vecs = jnp.asarray(self._vecs_np[start:])
            scales = jnp.asarray(self._scales_np[start:])
            valid = jnp.asarray(self._valid_np[start:])
            # Certificate term + pre-scaled bf16 mirror for the quantized
            # fast pass-1 (one corpus pass each per index version,
            # amortized across all queries). SHODH_TOPK_INT8 swaps the
            # selection mirror for the int8-MXU pack.
            # Pack built only at sizes the certified int8 path serves
            # (below _int8_min_rows the exact path runs and the pack would
            # be one wasted corpus pass + jit compile per index version).
            int8_pack = (
                corpus_cert_pack_default(vecs, scales, valid)
                if _int8_enabled() and self.dtype == "int8"
                and len(vecs) >= _int8_min_rows()
                else None
            )
            self._device = (
                vecs, scales, valid,
                corpus_score_bound(vecs, scales, valid),
                corpus_approx_bf16(vecs, scales, valid),
                int8_pack,
            )
        elif self._device is not None and self._device[5] is None:
            from shodh_tpu.ops.fused_topk import (
                _int8_enabled,
                _int8_min_rows,
                corpus_cert_pack_default,
            )

            if (
                _int8_enabled() and self.dtype == "int8"
                and len(self._device[0]) >= _int8_min_rows()
            ):
                # pack absent (built below the size threshold, or the flag
                # was flipped on mid-process): build it against the live
                # device window
                vecs, scales, valid = self._device[:3]
                pack = corpus_cert_pack_default(vecs, scales, valid)
                self._device = self._device[:5] + (pack,)
        return self._device

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k rows per query. Returns (scores (B,k), rows (B,k)).

        Invalid slots (fewer than k active rows) come back as row -1 with
        score -inf-ish; callers filter on row >= 0.
        """
        import jax.numpy as jnp

        from shodh_tpu.ops.distance import NEG_INF, brute_topk
        from shodh_tpu.ops.fused_topk import TILE_N, two_level_topk

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = queries.shape[0]
        if self.n_active == 0 or k <= 0:
            return (
                np.full((b, max(k, 0)), NEG_INF, np.float32),
                np.full((b, max(k, 0)), -1, np.int64),
            )
        if self._capacity <= _HOST_MAX and b <= 32:
            return self._search_host(queries, k)
        arrays = self._device_arrays()
        vecs, scales, valid, bound, approx, int8_pack = arrays
        start = self._device_start
        cap_dev = self._capacity - start
        bp = _pad_batch(b)
        kp = min(_pad_k(k), cap_dev)
        qpad = np.zeros((bp, self.dim), np.float32)
        qpad[:b] = queries
        # Padding rows are UNIT vectors, not zeros: a zero query makes the
        # certified fast paths' safety margin vacuous (boundary 0 + eps >=
        # kth score 0 fails the strict test), silently forcing the exact
        # fallback on EVERY padded batch — the fast path would never win
        # in production. Padded results are discarded below either way.
        qpad[b:, 0] = 1.0
        q = jnp.asarray(qpad)
        use_fused = cap_dev > _BRUTE_MAX and cap_dev % TILE_N == 0
        if use_fused:
            vals, rows = two_level_topk(q, vecs, valid, kp, scales,
                                        bound=bound, approx=approx,
                                        int8_pack=int8_pack)
        else:
            vals, rows = brute_topk(q, vecs, valid, kp, scales)
        vals = np.asarray(vals)[:b, :k]
        rows = np.asarray(rows)[:b, :k].astype(np.int64) + start
        if start > 0:
            vals, rows = self._merge_spilled(queries, vals, rows, start, k)
        rows = np.where(vals > NEG_INF / 2, rows, -1)
        return vals, rows

    def _merge_spilled(self, queries, dev_vals, dev_rows, start: int, k: int):
        """Score the host-resident prefix (rows < start) with BLAS and merge
        with the device window's top-k — exact on both engines, global
        tie-break (score desc, row asc)."""
        from shodh_tpu.ops.distance import NEG_INF

        prefix = self._vecs_np[:start]
        if self.dtype == "int8":
            h_scores = (queries @ prefix.T.astype(np.float32)) * self._scales_np[:start][None, :]
        else:
            h_scores = queries @ prefix.T
        h_scores = np.where(self._valid_np[:start][None, :] > 0, h_scores, NEG_INF)
        kk = min(k, start)
        order = np.argsort(-h_scores, axis=1, kind="stable")[:, :kk]
        h_vals = np.take_along_axis(h_scores, order, axis=1).astype(np.float32)
        h_rows = order.astype(np.int64)

        all_vals = np.concatenate([dev_vals, h_vals], axis=1)
        all_rows = np.concatenate([dev_rows, h_rows], axis=1)
        # global (score desc, row asc) per query
        sel = np.lexsort((all_rows, -all_vals), axis=1)[:, :k]
        out_v = np.take_along_axis(all_vals, sel, axis=1)
        out_r = np.take_along_axis(all_rows, sel, axis=1)
        if out_v.shape[1] < k:  # degenerate: fewer candidates than k
            pad = k - out_v.shape[1]
            out_v = np.pad(out_v, ((0, 0), (0, pad)), constant_values=NEG_INF)
            out_r = np.pad(out_r, ((0, 0), (0, pad)), constant_values=-1)
        return out_v, out_r

    def _search_host(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Host BLAS brute force, bit-identical tie-break to the device path
        (score desc, row asc)."""
        from shodh_tpu.ops.distance import NEG_INF

        self.flush()
        n = self._count
        vecs = self._vecs_np[:n]
        if self.dtype == "int8":
            scores = (queries @ vecs.T.astype(np.float32)) * self._scales_np[:n][None, :]
        else:
            scores = queries @ vecs.T
        scores = np.where(self._valid_np[:n][None, :] > 0, scores, NEG_INF)
        b = queries.shape[0]
        kk = min(k, n)
        # argsort(-scores) is stable -> ties resolve to ascending row id
        order = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
        vals = np.take_along_axis(scores, order, axis=1).astype(np.float32)
        rows = order.astype(np.int64)
        if kk < k:
            pad_v = np.full((b, k - kk), NEG_INF, np.float32)
            pad_r = np.full((b, k - kk), -1, np.int64)
            vals = np.concatenate([vals, pad_v], axis=1)
            rows = np.concatenate([rows, pad_r], axis=1)
        rows = np.where(vals > NEG_INF / 2, rows, -1)
        return vals, rows

    def get_vectors(self, rows) -> np.ndarray:
        """Dequantized f32 vectors for specific rows (host)."""
        self.flush()
        rows = np.asarray(rows, np.int64)
        v = self._vecs_np[rows]
        if self.dtype == "int8":
            return v.astype(np.float32) * self._scales_np[rows][:, None]
        return v.copy()

    # -- persistence (vamana_persist.rs analog: checksum-verified) -----------

    def save(self, path: str | Path) -> None:
        self.flush()
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path.with_suffix(".npz"),
            vecs=self._vecs_np[: self._count],
            scales=self._scales_np[: self._count],
            valid=self._valid_np[: self._count],
        )
        payload = path.with_suffix(".npz").read_bytes()
        meta = {
            "format": "shodh-tpu-index-v1",
            "dim": self.dim,
            "dtype": self.dtype,
            "count": self._count,
            "n_deleted": self._n_deleted,
            "epoch": self.epoch,
            "sha256": hashlib.sha256(payload).hexdigest(),
        }
        path.with_suffix(".json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, path: str | Path) -> "DeviceVectorIndex":
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        payload = path.with_suffix(".npz").read_bytes()
        digest = hashlib.sha256(payload).hexdigest()
        if digest != meta["sha256"]:
            raise ValueError(
                f"index checksum mismatch for {path}: expected {meta['sha256']}, got {digest}"
            )
        data = np.load(path.with_suffix(".npz"))
        idx = cls(dim=meta["dim"], dtype=meta["dtype"])
        count = int(meta["count"])
        if count:
            idx._grow(count)
            idx._vecs_np[:count] = data["vecs"]
            idx._scales_np[:count] = data["scales"]
            idx._valid_np[:count] = data["valid"]
        idx._count = count
        idx._n_deleted = int(meta["n_deleted"])
        idx.epoch = int(meta.get("epoch", 0))
        return idx
