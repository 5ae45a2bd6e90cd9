"""Quality measurement loop tools (the round-2 method, reusable).

Two modes over an ingested locomo-full system:

  python tools/probe_quality.py categories   # per-category r@10/ndcg/mrr
  python tools/probe_quality.py funnel CAT   # gold-funnel failure taxonomy

The method that produced round 2's +12pp held-out recall: (1) run
``funnel`` to find where golds are lost per category, (2) form a
discriminative hypothesis and measure gold-vs-nongold feature rates,
(3) implement behind an env knob, (4) sweep with ``categories`` (fast)
then confirm on the full suite, (5) let the 1,531-case suite decide.
Negative results get recorded in BENCHMARKS.md too.
"""

import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SHODH_EVAL_NOW", "2026-05-01T00:00:00Z")

import jax

jax.config.update("jax_platforms", "cpu")

from shodh_tpu.engine.memory_system import MemorySystem  # noqa: E402
from shodh_tpu.harness import diagnostics as diag  # noqa: E402
from shodh_tpu.harness.fixtures import load_cases  # noqa: E402
from shodh_tpu.harness.metrics import Metrics  # noqa: E402
from shodh_tpu.harness.runner import ingest_corpus  # noqa: E402
from shodh_tpu.types import LayerMode, Query, parse_ts  # noqa: E402
from shodh_tpu.utils import clock  # noqa: E402

CORPUS = "tests/recall/corpora/locomo.jsonl"
CASES = "tests/recall/locomo_cases.jsonl"
CATEGORIES = ("multi_hop", "single_hop", "temporal", "open_domain")


def build_system():
    clock.pin_now(parse_ts(os.environ["SHODH_EVAL_NOW"]))
    os.environ["SHODH_RECALL_READONLY"] = "1"
    system = MemorySystem(tempfile.mkdtemp())
    id_map = ingest_corpus(system, CORPUS)
    return system, id_map


def probe_categories() -> None:
    system, id_map = build_system()
    agg = {}
    for cat in CATEGORIES:
        cases = [c for c in load_cases(CASES) if c.category == cat]
        ms = []
        for case in cases:
            rel = {id_map[s]: g for s, g in case.relevance.items() if s in id_map}
            r = system.recall(Query(query_text=case.query, max_results=10, layers=LayerMode.FULL))
            ms.append(Metrics.compute(r.ids, rel, 10))
        agg[cat] = {
            "r@10": round(sum(m.recall_at_k for m in ms) / len(ms), 4),
            "ndcg": round(sum(m.ndcg_at_k for m in ms) / len(ms), 4),
            "mrr": round(sum(m.mrr for m in ms) / len(ms), 4),
        }
    print(os.environ.get("TAG", ""), agg)


def probe_funnel(cat: str) -> None:
    system, id_map = build_system()
    cases = [c for c in load_cases(CASES) if c.category == cat]
    print(f"{cat}: {len(cases)} cases")
    modes = collections.Counter()
    fails = []
    for case in cases:
        rel = {id_map[s]: g for s, g in case.relevance.items() if s in id_map}
        diag.arm(case.case_id, set(rel))
        r = system.recall(Query(query_text=case.query, max_results=10, layers=LayerMode.FULL))
        rec = diag.disarm()
        m = Metrics.compute(r.ids, rel, 10)
        if m.recall_at_k >= 1.0:
            modes["ok"] += 1
            continue
        s = rec.stage_ranks if rec else {}
        v, b, f, fi = s.get("vector"), s.get("bm25"), s.get("fused"), s.get("final")
        if v is None and b is None:
            modes["absent_both_legs"] += 1
        elif (f or 9999) <= 20 and (fi or 9999) > 10:
            modes["lost_after_fusion"] += 1
        elif (fi or 9999) <= 20:
            modes["near_miss_11_20"] += 1
        else:
            modes["deep_miss"] += 1
        fails.append((case, s, m))
    print(dict(modes))
    for c, s, m in fails[:25]:
        print(f"  {c.case_id} r={m.recall_at_k:.2f} {s} Q: {c.query[:70]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "funnel":
        probe_funnel(sys.argv[2] if len(sys.argv) > 2 else "single_hop")
    else:
        probe_categories()
