"""DeviceRecallEngine: serving-scale recall through the fused program.

Maintains device-aligned per-row metadata mirrors (importance, creation
time, arousal, credibility, tag penalty, feedback momentum) alongside the
vector index, so a recall is: host computes the sparse BM25/graph legs
(tiny), then ONE device program does cosine + fusion + L5 + top-k over the
whole corpus (ops/device_recall.py).

This is the high-throughput path for large corpora; the host funnel
(engine/memory_system.py) remains the full-featured path (all boost
layers). Mirrors rebuild lazily when the index grows and refresh on
maintenance.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Optional

import numpy as np

from shodh_tpu.engine.scoring import tag_penalty_for

_EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)


def _hours_since_epoch(dt: datetime) -> float:
    return (dt - _EPOCH).total_seconds() / 3600.0


class DeviceRecallEngine:
    def __init__(self, system):
        self.system = system
        self._built_rows = -1
        self._meta: dict[str, np.ndarray] = {}

    # -- mirrors ----------------------------------------------------------------

    def _ensure_mirrors(self) -> None:
        index = self.system.index
        index.flush()
        if self._built_rows == len(index):
            return
        cap = index.capacity
        meta = {
            "importance": np.full(cap, 0.5, np.float32),
            "created_hours": np.zeros(cap, np.float32),
            "arousal": np.zeros(cap, np.float32),
            "credibility": np.full(cap, 0.5, np.float32),
            "tag_penalty": np.ones(cap, np.float32),
            "momentum": np.zeros(cap, np.float32),
        }
        storage = self.system.storage
        fb = self.system.feedback
        for mem in storage.iter_memories():
            rows = storage.get_vector_map(mem.id).get("text", [])
            if not rows:
                continue
            mom = fb.momentum(mem.id) if fb is not None else 0.0
            for r in rows:
                if r >= cap:
                    continue
                meta["importance"][r] = mem.importance
                meta["created_hours"][r] = _hours_since_epoch(mem.created_at)
                meta["arousal"][r] = mem.experience.emotional.arousal
                meta["credibility"][r] = mem.experience.source.credibility
                meta["tag_penalty"][r] = tag_penalty_for(mem.experience.tags)
                meta["momentum"][r] = mom
        self._meta = meta
        self._built_rows = len(index)

    def invalidate(self) -> None:
        """Force a mirror rebuild (call after maintenance/feedback sweeps)."""
        self._built_rows = -1

    # -- recall -------------------------------------------------------------------

    def recall(self, query_text: str, k: int = 10, now: Optional[datetime] = None):
        """Fused-program recall. Returns list[(memory_id, score)]."""
        import jax.numpy as jnp

        from shodh_tpu.ops.device_recall import fused_recall
        from shodh_tpu.utils.clock import scoring_now

        system = self.system
        self._ensure_mirrors()
        index = system.index
        cap = index.capacity
        if cap == 0:
            return []
        now = now or scoring_now()

        qvec = system.embedder.encode_query(query_text)

        # Sparse host legs -> dense row arrays (touch only the hits)
        bm25 = np.zeros(cap, np.float32)
        if system.bm25 is not None:
            for mid, score in system.bm25.search(query_text, limit=max(64, k * 4)):
                for r in system.storage.get_vector_map(mid).get("text", []):
                    if r < cap:
                        bm25[r] = max(bm25[r], score)
        graph = np.zeros(cap, np.float32)
        density = 0.0
        if system.graph is not None and system.query_parser is not None:
            analysis = system.query_parser.analyze(query_text, now=now)
            seeds = analysis.entities or analysis.focal_terms[:6]
            if seeds:
                activation = system.graph.spreading_activation(seeds, now=now)
                for mid, act in activation.items():
                    for r in system.storage.get_vector_map(mid).get("text", []):
                        if r < cap:
                            graph[r] = max(graph[r], act)
            density = system.graph.edge_density()

        meta = self._meta
        now_h = _hours_since_epoch(now)
        hours_old = np.maximum(0.0, now_h - meta["created_hours"]).astype(np.float32)

        arrays = index._device_arrays()
        if arrays is None:
            return []
        vecs, scales, valid = arrays[:3]
        kk = min(k * 2, cap)
        vals, rows = fused_recall(
            jnp.asarray(qvec), vecs, scales, valid,
            jnp.asarray(bm25), jnp.asarray(graph),
            jnp.asarray(meta["importance"]), jnp.asarray(hours_old),
            jnp.asarray(meta["arousal"]), jnp.asarray(meta["credibility"]),
            jnp.asarray(meta["momentum"]), jnp.asarray(meta["tag_penalty"]),
            jnp.float32(density), k=kk,
        )
        vals, rows = np.asarray(vals), np.asarray(rows)
        out: list[tuple[str, float]] = []
        seen: set[str] = set()
        for v, r in zip(vals, rows):
            if v <= -1e29:
                continue
            mid = self.system.storage.memory_for_row(int(r))
            if mid is None or mid in seen:
                continue  # chunk dedup: keep max-sim row only
            seen.add(mid)
            out.append((mid, float(v)))
            if len(out) >= k:
                break
        return out
