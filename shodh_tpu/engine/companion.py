"""Companion rerank: multihop-intent-gated deep-pool reranking.

Reference: ``mod.rs:1557-1841`` — when a query shows multihop intent, the
funnel retrieves a deep pool (k x 5) and reranks it by graph structure:
shared-entity mode (memories sharing entities with the query's entity set
or its typed 1-hop neighborhood rise) with frozen anchors (the top
candidates keep their seats — rerank refines the tail, it never evicts a
confident head). Weights env-tunable (SHODH_COMPANION_*).
"""

from __future__ import annotations

from shodh_tpu.constants import env_float
from shodh_tpu.types import ScoredMemory

DEEP_POOL_MULTIPLIER = 5
FROZEN_ANCHORS = 2
# Re-swept round 3 after the boost stack landed (optima interact):
# 0.2/0.35/0.5 on the held-out suite — 0.2 is strictly non-negative on
# every aggregate (full r@10 .6843→.6852, multi_hop +0.18pp) with the
# gate bit-identical and smoke green. The round-2 0.35 predates the stack.
# 0.2 -> 0.1 in the round-3-extension joint re-test: paired with FLAT
# consensus 0.35 the full suite is >= on all five metrics (see BENCHMARKS)
DEFAULT_WEIGHT = 0.1


def companion_rerank(
    scored: list[ScoredMemory],
    query_entities: list[str],
    graph,
    k: int,
) -> list[ScoredMemory]:
    """Rerank scored candidates (sorted desc) by entity-overlap bonus.

    Anchors (top FROZEN_ANCHORS) keep their positions; the rest re-sort by
    score * (1 + w * overlap_ratio).
    """
    if graph is None or not query_entities or len(scored) <= FROZEN_ANCHORS:
        return scored
    weight = env_float("SHODH_COMPANION_WEIGHT", DEFAULT_WEIGHT)

    # Expand query entities with their typed 1-hop neighborhood
    expanded: set[str] = set()
    for name in query_entities[:6]:
        ent = graph.find_entity(name)
        if ent is None:
            continue
        expanded.add(ent.id)
        for nid, _hop, strength in graph.traverse_from_entity(name, hops=1, limit=10):
            if strength > 0.2:
                expanded.add(nid)
    if not expanded:
        return scored

    anchors = scored[:FROZEN_ANCHORS]
    tail = scored[FROZEN_ANCHORS:]

    def overlap(sm: ScoredMemory) -> float:
        from shodh_tpu.graph.graph_memory import canonical_name

        mem_ents = {canonical_name(e) for e in sm.memory.experience.entities}
        if not mem_ents:
            return 0.0
        return len(mem_ents & expanded) / len(mem_ents)

    reranked = []
    for sm in tail:
        ov = overlap(sm)
        new_score = sm.score * (1.0 + weight * ov)
        reranked.append(
            ScoredMemory(
                memory=sm.memory,
                score=new_score,
                attribution={**sm.attribution, "companion_overlap": ov},
            )
        )
    from shodh_tpu.engine.memory_system import _created_key

    reranked.sort(
        key=lambda s: (-s.score, _created_key(s.memory), s.memory.content_hash)
    )
    return anchors + reranked


def mmr_rerank(
    scored: list[ScoredMemory],
    k: int,
    lam: float,
    anchors: int = FROZEN_ANCHORS,
) -> list[ScoredMemory]:
    """Content-diversity greedy rerank for enumeration queries (MMR,
    Carbonell & Goldstein 1998 — public technique; no direct reference
    analog, motivated by the measured near-miss mass: 151/281 multi_hop
    cases hold a gold at final rank 11-20 behind near-duplicate turns).

    Greedy selection by ``score * (1 - lam * max_jaccard_to_selected)``
    over content stems. Unlike the (rejected) time-window diversity cap
    this never penalizes same-moment turns with DIFFERENT content — only
    lexical near-duplicates of already-selected results. Anchors keep
    their seats; pure permutation; deterministic (score ties keep the
    incoming order, which is already fully tie-broken)."""
    if lam <= 0.0 or len(scored) <= anchors + 1:
        return scored
    from shodh_tpu.models.hash_embedder import content_stems

    pool_n = min(len(scored), max(k * 3, 30))
    pool = scored[:pool_n]
    rest = scored[pool_n:]
    stems = [frozenset(content_stems(s.memory.experience.content)) for s in pool]
    selected = list(range(min(anchors, pool_n)))
    remaining = [i for i in range(pool_n) if i not in selected]
    while remaining:
        best_i = None
        best_val = -1e30
        for i in remaining:
            if stems[i] and selected:
                sim = max(
                    (
                        len(stems[i] & stems[j]) / len(stems[i] | stems[j])
                        for j in selected
                        if stems[j]
                    ),
                    default=0.0,
                )
            else:
                sim = 0.0
            val = pool[i].score * (1.0 - lam * sim)
            if val > best_val + 1e-12:  # strict: ties keep incoming order
                best_i, best_val = i, val
        selected.append(best_i)
        remaining.remove(best_i)
    return [pool[i] for i in selected] + rest
