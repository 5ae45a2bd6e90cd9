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
    blocker_clustered = 0  # 2nd+ top-10 item from its episode
    recoverable_cases = 0  # >=1 stranded gold from unseen episode AND >=1 clustered blocker
    multi_gold_cases = 0

    for case in cases:
        rel = {id_map[s]: g for s, g in case.relevance.items() if s in id_map}
        if len(rel) >= 2:
            multi_gold_cases += 1
        r = system.recall(
            Query(query_text=case.query, max_results=25, layers=LayerMode.FULL)
        )
        ids = list(r.ids)
        top10, tail = ids[:10], ids[10:25]
        m = Metrics.compute(top10, rel, 10)
        stranded = [i for i in tail if i in rel]
        if m.recall_at_k >= 1.0 or not stranded:
            continue
        n_near += 1
        top10_eps = collections.Counter(episode(inv.get(i, str(i))) for i in top10)
        case_unseen = 0
        for g in stranded:
            stranded_total += 1
            if top10_eps.get(episode(inv.get(g, str(g))), 0) == 0:
                stranded_unseen_episode += 1
                case_unseen += 1
        case_clustered = 0
        seen = collections.Counter()
        for i in top10:
            if i in rel:
                continue
            blocker_total += 1
            ep = episode(inv.get(i, str(i)))
            seen[ep] += 1
            # clustered if its episode already holds ANY earlier top-10 item
            if top10_eps[ep] >= 2 and seen[ep] >= 2:
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


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "multi_hop")
