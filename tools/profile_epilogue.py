"""Per-stage latency attribution over the locomo-full suite.

Builds the full store once, runs every case readonly, and aggregates
``RecallResult.stage_timings_ms`` per stage (sum / p50 / p95 / max) plus
end-to-end percentiles. This is the measurement arm behind the round-5
tail-latency and host-epilogue work (VERDICT round-4 weak #3 / #6):
the production serving path is host-epilogue-bound, so stage sums here
say exactly which stage buys QPS when cut.

  python tools/profile_epilogue.py [--limit N] [--top M]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SHODH_EVAL_NOW", "2026-05-01T00:00:00Z")

import jax

jax.config.update("jax_platforms", "cpu")

from shodh_tpu.engine.memory_system import MemorySystem  # noqa: E402
from shodh_tpu.harness.fixtures import load_cases  # noqa: E402
from shodh_tpu.harness.runner import ingest_corpus  # noqa: E402
from shodh_tpu.types import LayerMode, Query, parse_ts  # noqa: E402
from shodh_tpu.utils import clock  # noqa: E402

CORPUS = "tests/recall/corpora/locomo.jsonl"
CASES = "tests/recall/locomo_cases.jsonl"


def pct(vals, p):
    if not vals:
        return 0.0
    s = sorted(vals)
    return s[min(len(s) - 1, int(round(p * (len(s) - 1))))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0, help="cap case count (0 = all)")
    ap.add_argument("--top", type=int, default=12, help="slowest cases to print")
    ap.add_argument("--gcfreeze", action="store_true",
                    help="gc.freeze() the ingested store before the query loop "
                         "(tests the gen-2-collection tail hypothesis)")
    args = ap.parse_args()

    clock.pin_now(parse_ts(os.environ["SHODH_EVAL_NOW"]))
    os.environ["SHODH_RECALL_READONLY"] = "1"
    t0 = time.perf_counter()
    system = MemorySystem(tempfile.mkdtemp())
    ingest_corpus(system, CORPUS)
    print(f"ingest: {time.perf_counter() - t0:.1f}s", flush=True)

    cases = load_cases(CASES)
    if args.limit:
        cases = cases[: args.limit]

    import gc

    gc_counts_before = gc.get_stats()
    if args.gcfreeze:
        gc.collect()
        gc.freeze()

    stages: dict[str, list[float]] = {}
    totals: list[float] = []
    slow: list[tuple[float, str, dict]] = []
    for case in cases:
        q = Query(query_text=case.query, max_results=10, layers=LayerMode.FULL)
        t1 = time.perf_counter()
        res = system.recall(q)
        dt = (time.perf_counter() - t1) * 1000.0
        totals.append(dt)
        for k, v in res.stage_timings_ms.items():
            stages.setdefault(k, []).append(v)
        slow.append((dt, case.query[:70], dict(res.stage_timings_ms)))

    gc_counts_after = gc.get_stats()
    coll = [a["collections"] - b["collections"]
            for a, b in zip(gc_counts_after, gc_counts_before)]
    print(f"\ngc collections during query loop (gen0/1/2): {coll}")
    print(f"\ncases={len(totals)}  e2e p50={pct(totals, 0.5):.1f} "
          f"p95={pct(totals, 0.95):.1f} p99={pct(totals, 0.99):.1f} "
          f"max={max(totals):.1f} sum={sum(totals) / 1000:.1f}s")
    print(f"{'stage':>16} {'sum_s':>8} {'p50':>8} {'p95':>8} {'max':>8} {'n':>6}")
    for k, vals in sorted(stages.items(), key=lambda kv: -sum(kv[1])):
        print(f"{k:>16} {sum(vals) / 1000:>8.2f} {pct(vals, 0.5):>8.2f} "
              f"{pct(vals, 0.95):>8.2f} {max(vals):>8.2f} {len(vals):>6}")

    slow.sort(key=lambda t: -t[0])
    print("\nslowest cases:")
    for dt, qtext, tm in slow[: args.top]:
        hot = sorted(tm.items(), key=lambda kv: -kv[1])[:4]
        hot_s = " ".join(f"{k}={v:.0f}" for k, v in hot)
        print(f"  {dt:7.1f} ms  {qtext!r}  [{hot_s}]")


if __name__ == "__main__":
    main()
