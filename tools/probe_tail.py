"""Tail-case anatomy: build (or reuse) a persisted locomo-full store and
re-run named slow queries repeatedly, printing per-repeat stage timings.
Separates one-time costs (jit compile, cold caches) from per-call costs.

  python tools/probe_tail.py [--store DIR] [--repeats 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SHODH_EVAL_NOW", "2026-05-01T00:00:00Z")

import jax

jax.config.update("jax_platforms", "cpu")

from shodh_tpu.engine.memory_system import MemorySystem  # noqa: E402
from shodh_tpu.harness.runner import ingest_corpus  # noqa: E402
from shodh_tpu.types import LayerMode, Query, parse_ts  # noqa: E402
from shodh_tpu.utils import clock  # noqa: E402

CORPUS = "tests/recall/corpora/locomo.jsonl"

SLOW = [
    "When did Caroline go to the LGBTQ support group?",
    "In what country did Jolene's mother buy her the pendant?",
    "How does John describe the game season for his team?",
    "What dessert did Joanna share a photo of that has an almond flour crust?",
    "Which basketball team does Tim support?",
]
WARM = [
    "What did Melanie paint?",
    "Where does Caroline work?",
    "When did John join the team?",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/locomo_store")
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    clock.pin_now(parse_ts(os.environ["SHODH_EVAL_NOW"]))
    os.environ["SHODH_RECALL_READONLY"] = "1"
    fresh = not os.path.exists(os.path.join(args.store, "kv.sqlite"))
    t0 = time.perf_counter()
    system = MemorySystem(args.store)
    if fresh or len(system.index) == 0:
        del os.environ["SHODH_RECALL_READONLY"]
        ingest_corpus(system, CORPUS)
        system.save()
        os.environ["SHODH_RECALL_READONLY"] = "1"
        print(f"ingest+save: {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        print(f"open: {time.perf_counter() - t0:.1f}s rows={len(system.index)}", flush=True)

    for qt in WARM:
        system.recall(Query(query_text=qt, max_results=10, layers=LayerMode.FULL))

    for qt in SLOW:
        print(f"\n{qt!r}")
        for rep in range(args.repeats):
            q = Query(query_text=qt, max_results=10, layers=LayerMode.FULL)
            t1 = time.perf_counter()
            res = system.recall(q)
            dt = (time.perf_counter() - t1) * 1000
            hot = sorted(res.stage_timings_ms.items(), key=lambda kv: -kv[1])[:5]
            hot_s = " ".join(f"{k}={v:.0f}" for k, v in hot)
            print(f"  rep{rep}: {dt:7.1f} ms  [{hot_s}]")


if __name__ == "__main__":
    main()
