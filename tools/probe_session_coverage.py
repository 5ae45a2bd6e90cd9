"""Probe: per-session (dialogue-episode) coverage in multi_hop near-misses.

Hypothesis (verdict #3's untried coverage-aware family): for enumeration
questions ("all the times X..."), golds are spread across dialogue episodes
(conv:Dn) while top-10 blockers cluster — several results from the same
episode. If golds stranded at ranks 11-25 mostly come from episodes with NO
top-10 representative, a per-episode quota (keep top-m per episode, fill
with unseen-episode candidates) is discriminative; else it's another
measured kill like MMR/diversity-cap.

Usage: python tools/probe_session_coverage.py [category]
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SHODH_EVAL_NOW", "2026-05-01T00:00:00Z")

import jax

jax.config.update("jax_platforms", "cpu")

from tools.probe_quality import build_system, CASES  # noqa: E402
from shodh_tpu.harness.fixtures import load_cases  # noqa: E402
from shodh_tpu.harness.metrics import Metrics  # noqa: E402
from shodh_tpu.types import LayerMode, Query  # noqa: E402


def episode(source_id: str) -> str:
    # conv-26:D1:3 -> conv-26:D1 (one dialogue episode)
    parts = source_id.rsplit(":", 1)
    return parts[0] if len(parts) == 2 else source_id


def main(cat: str) -> None:
    system, id_map = build_system()
    inv = {v: k for k, v in id_map.items()}
    cases = [c for c in load_cases(CASES) if c.category == cat]

    n_near = 0
    stranded_total = 0
    stranded_unseen_episode = 0
    blocker_total = 0
    blocker_clustered = 0  # 2nd+ top-10 item (of ANY kind) from its episode
    recoverable_cases = 0  # >=1 stranded gold from unseen episode AND >=1 clustered blocker
    multi_gold_cases = 0
    # Conditional gold rates + swap simulation over ALL cases (the decisive
    # rejection numbers in BENCHMARKS.md "Episode-coverage quota"):
    clustered_items = 0  # top-10 items that are the 2nd+ from their episode
    clustered_gold = 0
    tail_unseen_items = 0  # rank-11..25 items from episodes unseen in top-10
    tail_unseen_gold = 0
    swap_gained = 0  # golds promoted by the simulated 3rd+-per-episode swap
    swap_lost = 0  # golds evicted by it

    for case in cases:
        rel = {id_map[s]: g for s, g in case.relevance.items() if s in id_map}
        if len(rel) >= 2:
            multi_gold_cases += 1
        r = system.recall(
            Query(query_text=case.query, max_results=25, layers=LayerMode.FULL)
        )
        ids = list(r.ids)
        top10, tail = ids[:10], ids[10:25]
        top10_eps = collections.Counter(episode(inv.get(i, str(i))) for i in top10)

        # -- population stats (all cases) --
        seen_any = collections.Counter()  # ALL top-10 items per episode, in rank order
        victims = []  # 3rd+ item from an episode (the quota's eviction set)
        for i in top10:
            ep = episode(inv.get(i, str(i)))
            seen_any[ep] += 1
            if seen_any[ep] >= 2:
                clustered_items += 1
                if i in rel:
                    clustered_gold += 1
            if seen_any[ep] >= 3:
                victims.append(i)
        unseen_tail = []
        for i in tail:
            if top10_eps.get(episode(inv.get(i, str(i))), 0) == 0:
                tail_unseen_items += 1
                unseen_tail.append(i)
                if i in rel:
                    tail_unseen_gold += 1
        # Simulated quota swap: evict 3rd+-per-episode top-10 items, fill
        # with unseen-episode tail candidates in rank order.
        fills = unseen_tail[: len(victims)]
        swap_lost += sum(1 for i in victims[: len(fills)] if i in rel)
        swap_gained += sum(1 for i in fills if i in rel)

        # -- near-miss shape stats (gold stranded at 11-25) --
        m = Metrics.compute(top10, rel, 10)
        stranded = [i for i in tail if i in rel]
        if m.recall_at_k >= 1.0 or not stranded:
            continue
        n_near += 1
        case_unseen = 0
        for g in stranded:
            stranded_total += 1
            if top10_eps.get(episode(inv.get(g, str(g))), 0) == 0:
                stranded_unseen_episode += 1
                case_unseen += 1
        case_clustered = 0
        first_at = {}  # episode -> earliest top-10 rank (any item kind)
        for rank, i in enumerate(top10):
            first_at.setdefault(episode(inv.get(i, str(i))), rank)
        for rank, i in enumerate(top10):
            if i in rel:
                continue
            blocker_total += 1
            # clustered = a STRICTLY EARLIER top-10 item (gold or blocker)
            # shares its episode
            if first_at[episode(inv.get(i, str(i)))] < rank:
                blocker_clustered += 1
                case_clustered += 1
        if case_unseen and case_clustered:
            recoverable_cases += 1

    print(f"{cat}: {len(cases)} cases, {multi_gold_cases} multi-gold")
    print(f"near-miss (gold at 11-25): {n_near}")
    print(
        f"stranded golds: {stranded_total}, from episode UNSEEN in top-10: "
        f"{stranded_unseen_episode} ({stranded_unseen_episode / max(1, stranded_total):.0%})"
    )
    print(
        f"top-10 blockers: {blocker_total}, clustered (2nd+ from episode): "
        f"{blocker_clustered} ({blocker_clustered / max(1, blocker_total):.0%})"
    )
    print(f"cases with both (quota-recoverable shape): {recoverable_cases}/{n_near}")
    print(
        f"P(gold | clustered top-10 item) = {clustered_gold}/{clustered_items} "
        f"({clustered_gold / max(1, clustered_items):.1%})"
    )
    print(
        f"P(gold | tail item from unseen episode) = {tail_unseen_gold}/"
        f"{tail_unseen_items} ({tail_unseen_gold / max(1, tail_unseen_items):.1%})"
    )
    print(
        f"simulated 3rd+-per-episode swap: +{swap_gained} golds gained, "
        f"-{swap_lost} lost"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "multi_hop")
